"""Native (C++) components, loaded via ctypes.

Build all native libs with:  python -m dream_yara_tpu.native.build
They are also auto-built on first use (cached next to the sources).
"""
