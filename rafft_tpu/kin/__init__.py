"""Kinetics: master-equation folding dynamics over the fast-folding graph.

  kinetics.py — parity engine (longdouble transition matrix, LAPACK eig),
                mirroring /root/reference/rafft/rafft_kin.py:48-150
  kin_jax.py  — batched device propagator (uniformised power iteration /
                expm) for sweep workloads
  plot.py     — population-trajectory figure
"""

from rafft_tpu.kin.kinetics import kinetics, get_transition_mat

__all__ = ["kinetics", "get_transition_mat"]
