"""I/O: ground-truth map schema, sequence containers, checkpointing."""
