"""Logging (format-parity with the reference's log files), image I/O,
visualization."""
