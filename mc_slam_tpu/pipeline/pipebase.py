"""Shared pipeline constants (the reference's tracking state machine,
include/Tracking.h:113-120)."""
NO_IMAGES_YET, NOT_INITIALIZED, OK, LOST = range(4)
