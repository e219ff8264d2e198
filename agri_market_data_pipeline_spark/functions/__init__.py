"""Column-expression helper library (no UDFs unless unavoidable)."""
