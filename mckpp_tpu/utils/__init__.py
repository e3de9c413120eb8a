"""Runtime services: timers, logging, namelist parsing."""
