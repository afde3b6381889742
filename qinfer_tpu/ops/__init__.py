"""Pallas TPU kernels for the SMC hot loops.

The reference's single native-code artifact is an OpenCL likelihood kernel
(``src/qinfer/gpu_models.py::AcceleratedPrecessionModel``, SURVEY.md §2
#18). The TPU-native equivalents live here:

* :mod:`qinfer_tpu.ops.precession` — fused likelihood × weight ×
  normalization/ESS kernel for the precession family (one HBM pass computes
  the new weights AND the three global reductions the engine needs).
* :mod:`qinfer_tpu.ops.resample` — systematic-resampling ancestor
  selection via block-scanned CDF inversion.
* :mod:`qinfer_tpu.ops.accelerated` — ``AcceleratedPrecessionModel``, the
  drop-in parity class backed by the Pallas kernel.

All kernels run in ``interpret=True`` mode off-TPU so the test suite (CPU,
virtual mesh) exercises identical code paths.
"""

from .precession import fused_precession_update, precession_pr0
from .resample import systematic_resample_indices
from .accelerated import AcceleratedPrecessionModel

__all__ = [
    "fused_precession_update",
    "precession_pr0",
    "systematic_resample_indices",
    "AcceleratedPrecessionModel",
]
