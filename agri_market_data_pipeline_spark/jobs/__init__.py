"""Runnable jobs: the thin orchestration layer over the engine
(SURVEY.md §2.A orchestrate_cron / sink_git_commit — scheduling and
publication live OUTSIDE the engine; these entry points are what a cron
/ Airflow / GitHub-Actions trigger invokes)."""
