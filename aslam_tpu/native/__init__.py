"""Native (C++) runtime components with ctypes bindings."""
