"""Host-side utilities: calibration, timers, drawing."""
