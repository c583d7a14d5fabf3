"""Two-phase training: state, losses, jitted steps, LR schedules, checkpoints."""
