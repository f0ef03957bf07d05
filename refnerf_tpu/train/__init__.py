"""Training system (L4): losses, schedules, optimizer, the sharded train step,
checkpointing."""
