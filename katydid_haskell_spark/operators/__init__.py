"""Table-level constraint classes and large-scale pipeline operators."""
