"""Viewer engine: thread-based training controller + runners."""
