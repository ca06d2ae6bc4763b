"""Sources: deterministic synthetic code corpus + catalog helpers."""
