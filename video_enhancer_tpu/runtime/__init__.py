"""Runtime: handlers wrapping jitted programs, job store, schedulers."""
