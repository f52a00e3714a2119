"""Column-expression helper libraries (all JVM-side built-ins, no UDFs)."""
