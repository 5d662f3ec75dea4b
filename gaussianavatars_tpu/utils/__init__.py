"""Host-side utilities: schedules, image metrics, PLY/OBJ IO, logging."""
