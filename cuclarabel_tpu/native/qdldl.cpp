// Sparse quasidefinite LDL^T factorization (QDLDL-style algorithm) with
// signed dynamic regularization, plus a greedy minimum-degree ordering.
//
// Native-equivalent of the reference's L1 direct-LDL backends
// (src/kktsolvers/direct-ldl/directldl_qdldl.jl wraps the C QDLDL
// library; this file is an independent from-scratch implementation of
// the same classical up-looking algorithm: Davis, "Direct Methods for
// Sparse Linear Systems", ch. 4).
//
// Input matrix: upper-triangular CSC (including diagonal), n x n.
// The factorization is LDL^T with unit lower-triangular L (strict
// lower triangle stored CSC) and diagonal D.  Quasidefinite matrices
// factor without pivoting; `dsigns` drives dynamic regularization:
// whenever sign(D[i]) != dsigns[i] or |D[i]| < eps, D[i] is bumped to
// dsigns[i] * delta (directldl_qdldl.jl:18-25 semantics).
//
// Exported C ABI (used via ctypes from Python):
//   ldl_etree    - elimination tree + column counts
//   ldl_factor   - numeric factorization
//   ldl_solve    - triangular solve with the factors
//   mindeg_order - greedy minimum-degree ordering of a graph

#include <cstdint>
#include <cmath>
#include <vector>
#include <algorithm>

using std::int64_t;

extern "C" {

// Computes the elimination tree and the column counts of L.
// Ap/Ai: upper-triangular CSC pattern (with diagonal), n columns.
// Outputs: etree (n), Lnz (n).  work must have length n.
// Returns the total number of nonzeros in L (strict lower triangle),
// or -1 if the matrix has an empty column (structurally deficient).
int64_t ldl_etree(int64_t n, const int64_t* Ap, const int64_t* Ai,
                  int64_t* work, int64_t* Lnz, int64_t* etree) {
    for (int64_t i = 0; i < n; i++) {
        work[i] = 0;
        Lnz[i] = 0;
        etree[i] = -1;
    }
    for (int64_t j = 0; j < n; j++) {
        work[j] = j;
        for (int64_t p = Ap[j]; p < Ap[j + 1]; p++) {
            int64_t i = Ai[p];
            if (i > j) return -1;  // not upper triangular
            while (work[i] != j) {
                if (etree[i] == -1) etree[i] = j;
                Lnz[i]++;
                work[i] = j;
                i = etree[i];
            }
        }
    }
    int64_t total = 0;
    for (int64_t i = 0; i < n; i++) total += Lnz[i];
    return total;
}

// Numeric LDL^T factorization (up-looking).
// Inputs: upper CSC (Ap, Ai, Ax), etree, Lnz from ldl_etree.
// Outputs: Lp (n+1), Li, Lx (nnz(L)), D (n), Dinv (n).
// dsigns: expected sign (+1/-1) of each D entry; if reg_enable != 0,
// D entries with the wrong sign or magnitude < eps are set to
// dsigns[i]*delta.  Work arrays: iwork (3n), fwork (n).
// Returns the number of positive D entries, or -1 on zero diagonal.
int64_t ldl_factor(int64_t n, const int64_t* Ap, const int64_t* Ai,
                   const double* Ax, const int64_t* etree,
                   const int64_t* Lnz, int64_t* Lp, int64_t* Li,
                   double* Lx, double* D, double* Dinv,
                   const int64_t* dsigns, int64_t reg_enable,
                   double eps, double delta, int64_t* iwork,
                   double* fwork) {
    int64_t* y_markers = iwork;
    int64_t* y_idx = iwork + n;
    int64_t* elim_buffer = iwork + 2 * n;
    double* y_vals = fwork;

    int64_t positive_d = 0;
    const int64_t UNUSED = -1;

    Lp[0] = 0;
    for (int64_t i = 0; i < n; i++) Lp[i + 1] = Lp[i] + Lnz[i];

    std::vector<int64_t> l_next(n);  // next free slot in each L column
    for (int64_t i = 0; i < n; i++) l_next[i] = Lp[i];
    for (int64_t i = 0; i < n; i++) {
        y_markers[i] = UNUSED;
        y_vals[i] = 0.0;
        D[i] = 0.0;
    }

    // first diagonal element
    if (Ap[1] - Ap[0] > 0 && Ai[Ap[0]] == 0) D[0] = Ax[Ap[0]];
    if (reg_enable && (D[0] == 0.0 || (double)dsigns[0] * D[0] < eps))
        D[0] = (double)dsigns[0] * delta;
    if (D[0] == 0.0) return -1;
    if (D[0] > 0.0) positive_d++;
    Dinv[0] = 1.0 / D[0];

    for (int64_t k = 1; k < n; k++) {
        int64_t n_entries = 0;  // entries in the sparse RHS y

        // scatter column k of A (above diagonal) into y, record the
        // elimination-tree paths
        for (int64_t p = Ap[k]; p < Ap[k + 1]; p++) {
            int64_t i = Ai[p];
            if (i == k) {
                D[k] = Ax[p];
                continue;
            }
            y_vals[i] = Ax[p];
            // walk up the etree until we hit something marked
            int64_t next_idx = i;
            int64_t n_path = 0;
            while (y_markers[next_idx] == UNUSED && next_idx < k) {
                y_markers[next_idx] = k;  // mark as visited for column k
                elim_buffer[n_path++] = next_idx;
                next_idx = etree[next_idx];
                if (next_idx == -1) break;
            }
            // push path in reverse onto the ordered index stack
            while (n_path > 0) {
                y_idx[n_entries++] = elim_buffer[--n_path];
            }
        }

        // eliminate in reverse topological order
        for (int64_t t = n_entries - 1; t >= 0; t--) {
            int64_t c = y_idx[t];
            double y_c = y_vals[c];
            y_vals[c] = 0.0;
            y_markers[c] = UNUSED;
            double l_kc = y_c * Dinv[c];

            // axpy: y -= y_c * L(:,c) restricted to rows < k;
            // also D[k] update and append l_kc to column c of L
            for (int64_t p = Lp[c]; p < l_next[c]; p++) {
                y_vals[Li[p]] -= Lx[p] * y_c;
            }
            Li[l_next[c]] = k;
            Lx[l_next[c]] = l_kc;
            l_next[c]++;
            D[k] -= y_c * l_kc;
        }

        if (reg_enable && (D[k] == 0.0 || (double)dsigns[k] * D[k] < eps))
            D[k] = (double)dsigns[k] * delta;
        if (D[k] == 0.0) return -1;
        if (D[k] > 0.0) positive_d++;
        Dinv[k] = 1.0 / D[k];
    }
    return positive_d;
}

// Solve (L + I) D (L + I)^T x = b in place (x contains b on entry).
void ldl_solve(int64_t n, const int64_t* Lp, const int64_t* Li,
               const double* Lx, const double* Dinv, double* x) {
    // forward: (L + I) y = b
    for (int64_t j = 0; j < n; j++) {
        double xj = x[j];
        for (int64_t p = Lp[j]; p < Lp[j + 1]; p++) {
            x[Li[p]] -= Lx[p] * xj;
        }
    }
    // diagonal
    for (int64_t j = 0; j < n; j++) x[j] *= Dinv[j];
    // backward: (L + I)^T x = y
    for (int64_t j = n - 1; j >= 0; j--) {
        double acc = x[j];
        for (int64_t p = Lp[j]; p < Lp[j + 1]; p++) {
            acc -= Lx[p] * x[Li[p]];
        }
        x[j] = acc;
    }
}

// Greedy minimum-degree ordering of a symmetric sparsity graph given in
// full CSC (both triangles, no diagonal needed).  perm[k] = vertex
// eliminated at step k.  Complexity O(n * nnz) worst case — intended
// for host-side setup on moderate graphs (chordal analysis and KKT
// ordering); replace with approximate minimum degree for huge systems.
void mindeg_order(int64_t n, const int64_t* Ap, const int64_t* Ai,
                  int64_t* perm) {
    std::vector<std::vector<int64_t>> adj(n);
    std::vector<bool> alive(n, true);
    for (int64_t j = 0; j < n; j++) {
        for (int64_t p = Ap[j]; p < Ap[j + 1]; p++) {
            if (Ai[p] != j) adj[j].push_back(Ai[p]);
        }
        std::sort(adj[j].begin(), adj[j].end());
        adj[j].erase(std::unique(adj[j].begin(), adj[j].end()), adj[j].end());
    }
    auto degree = [&](int64_t v) {
        int64_t d = 0;
        for (int64_t u : adj[v])
            if (alive[u]) d++;
        return d;
    };
    for (int64_t k = 0; k < n; k++) {
        int64_t best = -1, best_deg = n + 1;
        for (int64_t v = 0; v < n; v++) {
            if (!alive[v]) continue;
            int64_t d = degree(v);
            if (d < best_deg) {
                best = v;
                best_deg = d;
            }
        }
        perm[k] = best;
        alive[best] = false;
        // connect the alive neighborhood of `best` into a clique
        std::vector<int64_t> nb;
        for (int64_t u : adj[best])
            if (alive[u]) nb.push_back(u);
        for (int64_t u : nb) {
            for (int64_t w : nb) {
                if (w != u &&
                    !std::binary_search(adj[u].begin(), adj[u].end(), w)) {
                    adj[u].insert(
                        std::lower_bound(adj[u].begin(), adj[u].end(), w), w);
                }
            }
        }
    }
}

}  // extern "C"
