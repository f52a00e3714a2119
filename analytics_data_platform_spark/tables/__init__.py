"""Lakehouse table layer: write modes, schema policy, partition DSL,
table-property state store."""
