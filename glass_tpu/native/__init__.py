"""Native (C++) components, loaded through ctypes.

Built lazily on first use with g++ (no pybind11 in this image); the shared
object is cached next to the source.  Falls back gracefully (callers check
``polyclip.available``).
"""

from .build import load_polyclip
