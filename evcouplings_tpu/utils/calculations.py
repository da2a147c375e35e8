"""
General calculation helpers (entropy, dihedrals, MAD).

Parity target: reference evcouplings/utils/calculations.py:11-163.
These are small CPU-side helpers; the hot per-column entropy sweep over a
frequency matrix is vectorized with numpy (no per-row Python loop).
"""

import numpy as np


def entropy(X, normalize=False):
    """Shannon entropy (log2) of a distribution vector.

    With ``normalize=True``, returns conservation in [0, 1]
    (1 = fully conserved), computed as 1 - H / log2(len(X)).
    """
    X = np.asarray(X, dtype=float)
    X_ = X[X > 0]
    H = -np.sum(X_ * np.log2(X_))

    if normalize:
        return 1 - (H / np.log2(len(X)))
    return H


def entropy_rows(F, normalize=False):
    """Vectorized row-wise entropy of an (L x q) frequency matrix."""
    F = np.asarray(F, dtype=float)
    logF = np.where(F > 0, np.log2(np.where(F > 0, F, 1.0)), 0.0)
    H = -np.sum(np.where(F > 0, F, 0.0) * logF, axis=-1)
    if normalize:
        return 1 - (H / np.log2(F.shape[-1]))
    return H


def entropy_vector(model, normalize=True):
    """Positional entropies for single-site frequencies in a CouplingsModel."""
    return entropy_rows(model.fi(), normalize=normalize)


def entropy_map(model, normalize=True):
    """Map from position (model numbering) to column entropy."""
    cons = entropy_vector(model, normalize)
    return dict(zip(model.index_list, cons))


def dihedral_angle(p0, p1, p2, p3):
    """Dihedral/torsion angle (radians) defined by four 3D points."""
    b0 = -1.0 * (p1 - p0)
    b1 = p2 - p1
    b2 = p3 - p2

    b1 = b1 / np.linalg.norm(b1)

    # vector rejections of b0/b2 onto the plane perpendicular to b1
    v = b0 - np.dot(b0, b1) * b1
    w = b2 - np.dot(b2, b1) * b1

    x = np.dot(v, w)
    y = np.dot(np.cross(b1, v), w)
    return np.arctan2(y, x)


def median_absolute_deviation(x, scale=1.4826):
    """Scaled median absolute deviation (default scale matches Gaussian SD)."""
    med = np.median(x)
    mad = np.median(np.abs(x - med))
    return scale * mad
