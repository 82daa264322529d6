"""Native (C++) runtime components, consumed via ctypes.

Build with ``make -C native`` from the repo root; every entry point has a
pure-Python fallback so the framework works without the shared library.
"""
