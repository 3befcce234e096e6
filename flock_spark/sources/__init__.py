"""Data sources: deterministic NEXMark/YSB generators (reference:
flock/src/datasource/)."""
