"""Custom Pallas TPU kernels for the hot search ops.

Most of the search step is best served by XLA's own fusions (full-array
one-hot dots and selects saturate HBM bandwidth; measured: hand-rolled
Pallas gathers/scatters lose to XLA's on this chip because grid steps
serialize on the single core).  Kernels live here where a single fused
Mosaic kernel replaces a swarm of launch-bound XLA kernels at equal or
better wall-clock -- see each module's docstring for the measurements.
"""

from .score_scan import score_scan, score_scan_reference

__all__ = ["score_scan", "score_scan_reference"]
