"""Host symbolic analysis for the device sparse KKT backend."""

import numpy as np
import scipy.sparse as sp

from cuclarabel_tpu.kkt import sparse_symbolic as ss


def _upper_csc(M):
    U = sp.triu(sp.csc_matrix(M)).tocsc()
    U.sort_indices()
    return U.indptr.astype(np.int64), U.indices.astype(np.int64)


def _random_sparse_spd(rng, N, density=0.05):
    A = sp.random(N, N, density=density, random_state=np.random.RandomState(0))
    M = (A + A.T + N * sp.eye(N)).tocsc()
    return M


def test_etree_matches_dense_fill():
    """Column counts equal the exact symbolic fill of the factor."""
    rng = np.random.default_rng(0)
    N = 40
    M = _random_sparse_spd(rng, N)
    Ap, Ai = _upper_csc(M)
    parent, colcount = ss.etree_colcounts(N, Ap, Ai)
    cols = ss.row_patterns(N, Ap, Ai, parent)
    # check against dense LL' fill simulation
    pat = (np.asarray(M.todense()) != 0)
    for k in range(N):
        pat[k, k] = True
    for k in range(N):
        nz = np.nonzero(pat[k + 1:, k])[0] + k + 1
        for i in nz:
            pat[i[None], nz] = True  # fill
            pat[nz, i[None]] = True
    for j in range(N):
        expect = sorted(np.nonzero(pat[j + 1:, j])[0] + j + 1)
        assert list(cols[j]) == expect, j
        assert colcount[j] == len(expect)


def test_supernode_partition_covers():
    rng = np.random.default_rng(1)
    N = 60
    M = _random_sparse_spd(rng, N, density=0.08)
    Ap, Ai = _upper_csc(M)
    plan = ss.analyze(N, Ap, Ai, order=np.arange(N))
    assert plan.sn_starts[0] == 0 and plan.sn_starts[-1] == N
    assert (np.diff(plan.sn_starts) > 0).all()
    # levels partition the supernodes, children before parents
    seen = np.concatenate(plan.levels)
    assert sorted(seen) == list(range(plan.ns))
    for s in range(plan.ns):
        p = plan.sn_parent[s]
        if p != -1:
            assert plan.sn_level[p] > plan.sn_level[s]


def test_child_rows_contained_in_parent_front():
    """Multifrontal containment: a child's row set must embed in the
    parent's columns + rows (extend-add well-posedness)."""
    rng = np.random.default_rng(2)
    N = 80
    M = _random_sparse_spd(rng, N, density=0.06)
    Ap, Ai = _upper_csc(M)
    plan = ss.analyze(N, Ap, Ai)
    for s in range(plan.ns):
        p = plan.sn_parent[s]
        if p == -1:
            continue
        pcols = set(range(plan.sn_starts[p], plan.sn_starts[p + 1]))
        pfront = pcols | set(plan.sn_rows[p].tolist())
        assert set(plan.sn_rows[s].tolist()) <= pfront, (s, p)


def test_mindeg_reduces_fill():
    """The fill-reducing ordering should not do worse than natural order
    on a 2D grid Laplacian."""
    k = 8
    G = sp.kron(sp.eye(k), sp.diags([-1, 2, -1], [-1, 0, 1], (k, k))) + \
        sp.kron(sp.diags([-1, 2, -1], [-1, 0, 1], (k, k)), sp.eye(k))
    G = (G + 4 * sp.eye(k * k)).tocsc()
    N = k * k
    Ap, Ai = _upper_csc(G)

    def fill(order):
        plan = ss.analyze(N, Ap, Ai, order=order)
        return sum(len(r) for r in plan.sn_rows) + sum(
            (plan.front_width(s) * (plan.front_width(s) + 1)) // 2
            for s in range(plan.ns)
        )

    f_nat = fill(np.arange(N))
    f_md = fill(None)
    assert f_md <= f_nat * 1.1


def test_amalgamation_widens_separator_supernodes():
    """Dissection orderings give nearly every separator column extra
    etree children, so fundamental supernodes are width-1 there; the
    relaxed amalgamation pass must still produce wide panels and a
    shallow level schedule (pre-amalgamation: a 20x20 grid KKT had
    ~N/3 levels of width-1 supernodes)."""
    k = 20
    n = k * k
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (k, k))
    P = (sp.kron(sp.eye(k), T) + sp.kron(T, sp.eye(k)) + sp.eye(n)).tocsc()
    A = sp.vstack([sp.csr_matrix(np.ones((1, n))), -sp.eye(n)]).tocsc()
    m = n + 1
    N = n + m
    K = sp.bmat([[P, A.T], [None, -sp.eye(m)]], format="csc")
    Ap, Ai = _upper_csc(K)
    nd = ss.nested_dissection(N, Ap, Ai)
    plan = ss.analyze(N, Ap, Ai, order=nd)

    widths = np.diff(plan.sn_starts)
    assert widths.max() >= 8, widths.max()
    # mean width over the non-leaf supernodes must be » 1
    assert widths.mean() > 2.0, widths.mean()
    assert len(plan.levels) < N // 10, len(plan.levels)
    # containment invariant survives amalgamation
    for s in range(plan.ns):
        p = plan.sn_parent[s]
        if p == -1:
            continue
        pcols = set(range(plan.sn_starts[p], plan.sn_starts[p + 1]))
        pfront = pcols | set(plan.sn_rows[p].tolist())
        assert set(plan.sn_rows[s].tolist()) <= pfront, (s, p)
