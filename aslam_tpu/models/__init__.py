"""Pipeline state machines (replaces reference System/ Core/ LoopClosing/)."""
