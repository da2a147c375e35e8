"""
Mean-field DCA tests: kernels vs literal loop oracles, the end-to-end
fit on a synthetic focus alignment, DI scoring, and plmc_v2 round-trip
with the negative-lambda_h mean-field marker.
"""

import numpy as np
import pytest

from oracles import (
    o_compute_covariance_matrix, o_direct_information, o_fields,
    o_regularize_pair_frequencies, o_reshape_invC_to_4d, o_tilde_fields,
    random_symmetric_J,
)

from evcouplings_tpu.align.alignment import Alignment
from evcouplings_tpu.couplings.mean_field import (
    MeanFieldCouplingsModel,
    MeanFieldDCA,
    regularize_frequencies,
    regularize_pair_frequencies,
)
from evcouplings_tpu.couplings.model import CouplingsModel
from evcouplings_tpu.ops import mean_field as mf

RNG = np.random.default_rng(23)   # rebound per test below

@pytest.fixture(autouse=True)
def _per_test_rng(request):
    """Rebind the module RNG to a fresh, per-test deterministic stream
    (seeded from the test id) so a test's input data never depends on
    which tests ran before it — `-k` selection, reordering, or adding
    a test above no longer changes anyone's draws."""
    import zlib

    global RNG
    RNG = np.random.default_rng(zlib.crc32(request.node.nodeid.encode()))



def random_freqs(L=7, q=5):
    f_i = RNG.dirichlet(np.ones(q), size=L)
    # symmetric positive pair frequencies with matching diagonal
    f_ij = np.einsum("ia,jb->ijab", f_i, f_i)
    noise = RNG.uniform(0, 0.01, size=(L, L, q, q))
    noise = 0.5 * (noise + noise.transpose(1, 0, 3, 2))
    f_ij = f_ij + noise
    f_ij /= f_ij.sum(axis=(2, 3), keepdims=True)
    idx = np.arange(L)
    diag = np.zeros((L, q, q))
    diag[:, np.arange(q), np.arange(q)] = f_i
    f_ij[idx, idx] = diag
    return f_i, f_ij


class TestKernels:
    def test_covariance_matrix(self):
        f_i, f_ij = random_freqs()
        fr = regularize_frequencies(f_i)
        frij = regularize_pair_frequencies(f_ij)
        assert mf.compute_covariance_matrix(fr, frij) == pytest.approx(
            o_compute_covariance_matrix(fr, frij)
        )

    def test_regularize_pair_frequencies(self):
        _, f_ij = random_freqs()
        assert regularize_pair_frequencies(f_ij, 0.3) == pytest.approx(
            o_regularize_pair_frequencies(f_ij, 0.3)
        )

    def test_reshape_invC(self):
        L, q = 6, 4
        M = RNG.normal(size=(L * (q - 1), L * (q - 1)))
        assert mf.reshape_invC_to_4d(M, L, q) == pytest.approx(
            o_reshape_invC_to_4d(M, L, q)
        )

    def test_fields(self):
        f_i, _ = random_freqs()
        fr = regularize_frequencies(f_i)
        J = RNG.normal(size=(7, 7, 5, 5)) * 0.1
        assert mf.fields_from_couplings(J, fr) == pytest.approx(
            o_fields(J, fr)
        )

    def test_tilde_fields(self):
        f_i, _ = random_freqs()
        fr = regularize_frequencies(f_i)
        W = np.exp(RNG.normal(size=(5, 5)) * 0.3)
        hi, hj = mf.tilde_fields(W, fr[0], fr[1])
        ohi, ohj = o_tilde_fields(W, fr[0], fr[1])
        assert hi == pytest.approx(ohi)
        assert hj == pytest.approx(ohj)

    def test_direct_information_batched_matches_looped(self):
        L, q = 8, 5
        f_i, _ = random_freqs(L, q)
        fr = regularize_frequencies(f_i)
        J = random_symmetric_J(L, q, RNG, scale=0.2)
        di = mf.direct_information(J, fr)
        odi = o_direct_information(J, fr)
        # identical per-pair freeze points => exact match
        assert di == pytest.approx(odi, abs=1e-12)
        assert di == pytest.approx(di.T)
        assert np.all(np.diag(di) == 0)

    def test_direct_information_device(self):
        L, q = 6, 4
        f_i, _ = random_freqs(L, q)
        fr = regularize_frequencies(f_i)
        J = random_symmetric_J(L, q, RNG, scale=0.2)
        di_dev = mf.direct_information_device(J, fr)
        di_host = mf.direct_information(J, fr)
        assert di_dev == pytest.approx(di_host, abs=1e-6)


def synthetic_focus_alignment(N=120, L=9, seed=9):
    """a2m-style alignment: first row = target, uppercase focus cols."""
    rng = np.random.default_rng(seed)
    aa = np.array(list("ACDEFGHIKLMNPQRSTVWY-"))
    # column-biased sampling so frequencies are informative
    mat = np.empty((N, L), dtype="U1")
    for col in range(L):
        probs = rng.dirichlet(np.ones(21) * 0.5)
        mat[:, col] = rng.choice(aa, size=N, p=probs)
    # target: no gaps
    mat[0] = rng.choice(aa[:-1], size=L)
    ids = ["TARGET/5-{}".format(5 + L - 1)] + [
        "seq{}".format(i) for i in range(1, N)
    ]
    return Alignment(mat, ids)


class TestMeanFieldDCA:
    def test_fit_end_to_end(self):
        ali = synthetic_focus_alignment()
        dca = MeanFieldDCA(ali)
        model = dca.fit(theta=0.8, pseudo_count=0.5)

        assert isinstance(model, MeanFieldCouplingsModel)
        assert model.L == 9
        assert model.index_list[0] == 5
        # couplings = -inv(C) restricted to first q-1 symbols
        q = model.num_symbols
        assert np.all(model.J_ij[:, :, q - 1, :] == 0)
        # the EC table has DI scores
        ecs = model.ecs
        assert "di" in ecs.columns
        assert model.di_scores == pytest.approx(model.di_scores.T)

    def test_fit_kernel_parity(self):
        """J/h from the DCA pipeline equal the oracle pipeline."""
        ali = synthetic_focus_alignment(N=60, L=7)
        dca = MeanFieldDCA(ali)
        model = dca.fit(theta=0.9, pseudo_count=0.4)

        fr = dca.regularized_frequencies
        frij = dca.regularized_pair_frequencies
        C = o_compute_covariance_matrix(fr, frij)
        invC = -np.linalg.inv(C)
        J = o_reshape_invC_to_4d(invC, 7, ali.num_symbols)
        h = o_fields(J, fr)
        assert model.J_ij == pytest.approx(J, abs=1e-8)
        assert model.h_i == pytest.approx(h, abs=1e-8)

    def test_independent_model(self):
        ali = synthetic_focus_alignment(N=50, L=6)
        model = MeanFieldDCA(ali).fit()
        c0 = model.to_independent_model()
        assert np.all(c0.J_ij == 0)
        assert c0.h_i == pytest.approx(np.log(model.regularized_f_i))

    def test_raw_ec_file(self, tmp_path):
        ali = synthetic_focus_alignment(N=50, L=6)
        model = MeanFieldDCA(ali).fit()
        out = tmp_path / "x_ECs.txt"
        model.to_raw_ec_file(str(out))
        lines = out.read_text().strip().split("\n")
        assert len(lines) == 6 * 5 // 2
        assert len(lines[0].split(" ")) == 8  # i A_i j A_j mi mi_apc di cn


class TestMeanFieldRoundtrip:
    def test_plmc_v2_roundtrip(self, tmp_path):
        ali = synthetic_focus_alignment(N=80, L=8)
        model = MeanFieldDCA(ali).fit(theta=0.8, pseudo_count=0.5)
        path = tmp_path / "mf.model"

        model.to_file(str(path), precision="float64")
        # after writing, the in-memory model is back in decoded state
        assert model.lambda_h is None
        assert model.pseudo_count == 0.5

        loaded = CouplingsModel(str(path), precision="float64")
        # negative lambda_h in file => mean-field class
        assert isinstance(loaded, MeanFieldCouplingsModel)
        assert loaded.pseudo_count == pytest.approx(0.5)
        # the file stores only i < j blocks; the (unused) diagonal
        # J_ij[i, i] blocks of a mean-field fit are dropped on write,
        # exactly as in the reference codec
        off = ~np.eye(8, dtype=bool)
        assert loaded.J_ij[off] == pytest.approx(model.J_ij[off])
        assert loaded.h_i == pytest.approx(model.h_i)
        # regularized frequencies recomputed from raw file freqs
        assert loaded.regularized_f_i == pytest.approx(
            model.regularized_f_i
        )
        assert loaded.regularized_f_ij == pytest.approx(
            model.regularized_f_ij
        )
        # DI scores recomputed from file match the fit
        assert loaded.di_scores == pytest.approx(model.di_scores)

    def test_plmc_v1_write_rejected(self, tmp_path):
        ali = synthetic_focus_alignment(N=40, L=6)
        model = MeanFieldDCA(ali).fit()
        with pytest.raises(ValueError):
            model.to_file(str(tmp_path / "x.model"), file_format="plmc_v1")


class TestDeviceInversion:
    def test_device_fit_matches_numpy_fit(self):
        import numpy as np

        from evcouplings_tpu.align.alignment import Alignment
        from evcouplings_tpu.couplings.mean_field import MeanFieldDCA

        rng = np.random.default_rng(5)
        aa = list("ACDEFGHIKLMNPQRSTVWY")
        N, L = 80, 8
        mat = rng.choice(aa, size=(N, L))
        seqs = {
            ("T/1-{}".format(L) if i == 0 else "s{}".format(i)):
                "".join(mat[i])
            for i in range(N)
        }
        ali = Alignment.from_dict(seqs)

        m_host = MeanFieldDCA(ali).fit(theta=0.8, pseudo_count=0.5)
        m_dev = MeanFieldDCA(ali).fit(
            theta=0.8, pseudo_count=0.5, device=True
        )

        # device path runs at the backend's native precision (f64 on
        # the x64 CPU test backend, f32 on TPU); couplings must agree
        # to matmul precision either way
        np.testing.assert_allclose(
            m_dev.J_ij, m_host.J_ij, rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            m_dev.h_i, m_host.h_i, rtol=1e-4, atol=1e-6
        )


class TestShardedInversion:
    """Column-sharded -inv(C) (ops/mean_field.py
    invert_covariance_sharded): the mean-field hot step on a multi-
    device mesh, run here on the 8-virtual-device CPU test mesh."""

    def test_sharded_matches_numpy(self):
        from evcouplings_tpu.ops.mean_field import (
            invert_covariance_sharded,
        )
        from evcouplings_tpu.parallel import make_mesh

        rng = np.random.default_rng(17)
        # D NOT a multiple of the 8-device mesh: exercises column pad
        D = 8 * 5 + 3
        A = rng.standard_normal((D, D))
        C = A @ A.T + D * np.eye(D)

        got = np.asarray(invert_covariance_sharded(C, make_mesh()))
        np.testing.assert_allclose(got, -np.linalg.inv(C), atol=1e-8)

    def test_mesh_fit_matches_host_fit(self):
        from evcouplings_tpu.parallel import make_mesh

        ali = synthetic_focus_alignment(N=60, L=7)
        m_host = MeanFieldDCA(ali).fit(theta=0.8, pseudo_count=0.5)
        m_mesh = MeanFieldDCA(ali).fit(
            theta=0.8, pseudo_count=0.5, mesh=make_mesh()
        )
        np.testing.assert_allclose(
            m_mesh.J_ij, m_host.J_ij, rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            m_mesh.h_i, m_host.h_i, rtol=1e-4, atol=1e-6
        )
