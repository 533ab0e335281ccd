"""Native (C++) runtime components, loaded via ctypes with Python fallbacks."""
from .build import load_track_builder, build_native
