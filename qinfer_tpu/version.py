"""Version information for qinfer_tpu.

Reference parity: ``src/qinfer/version.py::version`` (the reference exposes a
flat version string; we do the same).
"""

version = "0.1.0"
__version__ = version
