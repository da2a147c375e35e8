"""
TPU-native numerical kernels (JAX/XLA/Pallas).

This package replaces the reference's numba kernels
(evcouplings/align/alignment.py:1078-1233, evcouplings/couplings/model.py:25-233,
evcouplings/couplings/mean_field.py, evcouplings/compare/distances.py:24-88)
and the external `plmc` C binary with in-process accelerator kernels:

- encode:       char-code <-> one-hot encodings of MSAs
- weights:      O(N^2 L) sequence-identity reweighting (blocked MXU matmuls)
- frequencies:  weighted single-site and pairwise symbol counts
- hamiltonian:  Potts-model statistical energies and mutation deltas
- gauge:        zero-sum gauge transform
- scores:       FN/CN/MI coupling scores + average product correction
- plm:          pseudolikelihood Potts-model fit (the plmc replacement)
- plm_sites:    site-sharded asymmetric PLM fit (large-L model parallel)
- lbfgs:        scan-chained flat-vector LBFGS engine
- mean_field:   mean-field DCA (covariance inversion + DI)
- distances:    residue-residue min-atom distance maps
"""
