"""Training and inference engines (reference lib/trains/, lib/detectors/)."""
