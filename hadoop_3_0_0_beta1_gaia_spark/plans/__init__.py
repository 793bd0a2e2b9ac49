"""Query plans: the engine's operator-inventory registry (SURVEY §2)."""
