"""Training runtime: criteria (pure-function losses), optimizers/schedulers,
train state, jitted train/valid steps over a device mesh, checkpointing."""
