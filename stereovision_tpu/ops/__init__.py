"""Pallas TPU kernels for the hot compute paths.

XLA handles most of the engine well (fused elementwise chains, convs, reduces);
these kernels cover the parts where XLA's schedule loses: the sequential SGM
path recurrence (ops.sgm_pallas.aggregate_dir) and the fused winner-take-all
over the aggregated volume (ops.sgm_pallas.wta).
"""
