"""Utilities: timers, logging."""
