"""Host utilities: WAV I/O, timing meters, unicode class tables."""
