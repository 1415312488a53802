"""flo_tpu — a TPU-native reimplementation of the flo dual-mode audio codec.

Batch-first architecture: the unit of work is a batch of frames shaped
[lanes, samples]; all codec math runs as jitted XLA/Pallas programs over the
batch, while variable-length bitstream assembly runs in a vectorized host
finalizer. The public API mirrors libflo/src/lib.rs.
"""

from .core.constants import VERSION_STRING as __format_version__

__version__ = "0.1.0"


def version() -> str:
    """Format version string (lib.rs:443-446)."""
    return __format_version__
