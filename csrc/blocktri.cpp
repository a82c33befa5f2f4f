// Native block-tridiagonal + arrowhead KKT solver.
//
// This is the host-side/native counterpart of the JAX structured KKT solve
// (ctdirect_tpu/solver/structured_kkt.py) — the role general sparse direct
// solvers (MUMPS/umfpack/cuDSS) play in the reference stack (SURVEY.md §2.2),
// specialized to the collocation structure: no symbolic analysis, no fill-in,
// O(N) block elimination with a dense border Schur complement.
//
// Used from Python via ctypes (ctdirect_tpu/native) as an independent oracle
// for the JAX solvers and as a CPU fallback path. Batched entry point threads
// over instances with OpenMP when available.
//
// Layout (row-major, doubles):
//   A : N  x bs x bs   diagonal blocks (symmetric indefinite KKT blocks)
//   B : (N-1) x bs x bs   super-diagonal coupling i -> i+1 (sub-diag = B^T)
//   E : N x bs x wb    border (arrowhead) coupling
//   F : wb x wb        border block
//   r : N x bs, rb : wb   right-hand side
// Solves
//   [ blocktri(A,B)  E ] [X ]   [r ]
//   [ E^T            F ] [xb] = [rb]

#include <cmath>
#include <cstring>
#include <vector>

namespace {

// Dense LU with partial pivoting; solves M X = RHS in place (M: n x n,
// RHS: n x k, both row-major). Returns 0 on success, -1 on singular pivot.
int lu_solve(double* M, double* RHS, int n, int k) {
    std::vector<int> piv(n);
    for (int j = 0; j < n; ++j) {
        int p = j;
        double best = std::fabs(M[j * n + j]);
        for (int i = j + 1; i < n; ++i) {
            double v = std::fabs(M[i * n + j]);
            if (v > best) { best = v; p = i; }
        }
        if (best == 0.0) return -1;
        piv[j] = p;
        if (p != j) {
            for (int c = 0; c < n; ++c) std::swap(M[j * n + c], M[p * n + c]);
            for (int c = 0; c < k; ++c) std::swap(RHS[j * k + c], RHS[p * k + c]);
        }
        const double d = M[j * n + j];
        for (int i = j + 1; i < n; ++i) {
            const double l = M[i * n + j] / d;
            M[i * n + j] = l;
            if (l != 0.0) {
                for (int c = j + 1; c < n; ++c) M[i * n + c] -= l * M[j * n + c];
                for (int c = 0; c < k; ++c) RHS[i * k + c] -= l * RHS[j * k + c];
            }
        }
    }
    // back substitution
    for (int j = n - 1; j >= 0; --j) {
        const double d = M[j * n + j];
        for (int c = 0; c < k; ++c) {
            double s = RHS[j * k + c];
            for (int i = j + 1; i < n; ++i) s -= M[j * n + i] * RHS[i * k + c];
            RHS[j * k + c] = s / d;
        }
    }
    return 0;
}

// C = C - Aop^T? No: helpers for small row-major matmuls.
// C (m x p) -= A (m x n) * B (n x p)
void gemm_sub(const double* A, const double* B, double* C, int m, int n, int p) {
    for (int i = 0; i < m; ++i)
        for (int kk = 0; kk < n; ++kk) {
            const double a = A[i * n + kk];
            if (a == 0.0) continue;
            const double* Bk = B + kk * p;
            double* Ci = C + i * p;
            for (int j = 0; j < p; ++j) Ci[j] -= a * Bk[j];
        }
}

// C (m x p) -= A^T (m x n; A stored n x m) * B (n x p)
void gemm_tn_sub(const double* A, const double* B, double* C, int m, int n, int p) {
    for (int kk = 0; kk < n; ++kk) {
        const double* Ak = A + kk * m;
        const double* Bk = B + kk * p;
        for (int i = 0; i < m; ++i) {
            const double a = Ak[i];
            if (a == 0.0) continue;
            double* Ci = C + i * p;
            for (int j = 0; j < p; ++j) Ci[j] -= a * Bk[j];
        }
    }
}

}  // namespace

extern "C" {

// Returns 0 on success; -(i+1) if block i's factorization hit a zero pivot,
// -1000001 for the border system.
int blocktri_solve(int N, int bs, int wb,
                   const double* A, const double* B, const double* E,
                   const double* F, const double* r, const double* rb,
                   double* X, double* xb) {
    const int bb = bs * bs;
    const int bw_ = bs * wb;
    // workspaces: eliminated blocks and stacked RHS [B_i | E~_i | r~_i]
    std::vector<double> Atil(bb), Work((size_t)bs * (bs + wb + 1));
    std::vector<double> Etil((size_t)N * bw_), rtil((size_t)N * bs);
    std::vector<double> UinvB((size_t)N * bb);   // A~_i^{-1} B_i
    std::vector<double> UinvE((size_t)N * bw_);  // A~_i^{-1} E~_i
    std::vector<double> Uinvr((size_t)N * bs);   // A~_i^{-1} r~_i
    std::vector<double> Ftil((size_t)wb * wb), rbtil(wb);

    std::memcpy(Ftil.data(), F, sizeof(double) * wb * wb);
    std::memcpy(rbtil.data(), rb, sizeof(double) * wb);
    std::memcpy(Etil.data(), E, sizeof(double) * (size_t)N * bw_);
    std::memcpy(rtil.data(), r, sizeof(double) * (size_t)N * bs);

    const int k = bs + wb + 1;
    for (int i = 0; i < N; ++i) {
        // A~_i = A_i - B_{i-1}^T (A~_{i-1}^{-1} B_{i-1})
        std::memcpy(Atil.data(), A + (size_t)i * bb, sizeof(double) * bb);
        if (i > 0) {
            const double* Bp = B + (size_t)(i - 1) * bb;
            gemm_tn_sub(Bp, &UinvB[(size_t)(i - 1) * bb], Atil.data(), bs, bs, bs);
            gemm_tn_sub(Bp, &UinvE[(size_t)(i - 1) * bw_], &Etil[(size_t)i * bw_], bs, bs, wb);
            gemm_tn_sub(Bp, &Uinvr[(size_t)(i - 1) * bs], &rtil[(size_t)i * bs], bs, bs, 1);
        }
        // stack RHS = [B_i | E~_i | r~_i] and solve A~_i^{-1} RHS
        for (int row = 0; row < bs; ++row) {
            double* w = Work.data() + (size_t)row * k;
            if (i < N - 1)
                std::memcpy(w, B + (size_t)i * bb + (size_t)row * bs, sizeof(double) * bs);
            else
                std::memset(w, 0, sizeof(double) * bs);
            std::memcpy(w + bs, &Etil[(size_t)i * bw_ + (size_t)row * wb], sizeof(double) * wb);
            w[bs + wb] = rtil[(size_t)i * bs + row];
        }
        if (lu_solve(Atil.data(), Work.data(), bs, k) != 0) return -(i + 1);
        for (int row = 0; row < bs; ++row) {
            const double* w = Work.data() + (size_t)row * k;
            std::memcpy(&UinvB[(size_t)i * bb + (size_t)row * bs], w, sizeof(double) * bs);
            std::memcpy(&UinvE[(size_t)i * bw_ + (size_t)row * wb], w + bs, sizeof(double) * wb);
            Uinvr[(size_t)i * bs + row] = w[bs + wb];
        }
        // border Schur: F~ -= E~_i^T (A~_i^{-1} E~_i), rb~ -= E~_i^T (A~_i^{-1} r~_i)
        gemm_tn_sub(&Etil[(size_t)i * bw_], &UinvE[(size_t)i * bw_], Ftil.data(), wb, bs, wb);
        gemm_tn_sub(&Etil[(size_t)i * bw_], &Uinvr[(size_t)i * bs], rbtil.data(), wb, bs, 1);
    }

    // border solve
    if (lu_solve(Ftil.data(), rbtil.data(), wb, 1) != 0) return -1000001;
    std::memcpy(xb, rbtil.data(), sizeof(double) * wb);

    // back substitution: X_i = Uinvr_i - UinvE_i xb - UinvB_i X_{i+1}
    for (int i = N - 1; i >= 0; --i) {
        double* Xi = X + (size_t)i * bs;
        std::memcpy(Xi, &Uinvr[(size_t)i * bs], sizeof(double) * bs);
        gemm_sub(&UinvE[(size_t)i * bw_], xb, Xi, bs, wb, 1);
        if (i < N - 1) gemm_sub(&UinvB[(size_t)i * bb], X + (size_t)(i + 1) * bs, Xi, bs, bs, 1);
    }
    return 0;
}

// Batched variant: `batch` independent systems, contiguous layouts.
// Returns 0 if all succeeded, else the first nonzero status.
int blocktri_solve_batch(int batch, int N, int bs, int wb,
                         const double* A, const double* B, const double* E,
                         const double* F, const double* r, const double* rb,
                         double* X, double* xb) {
    const size_t sA = (size_t)N * bs * bs, sB = (size_t)(N - 1) * bs * bs;
    const size_t sE = (size_t)N * bs * wb, sF = (size_t)wb * wb;
    const size_t sr = (size_t)N * bs, srb = (size_t)wb;
    int status = 0;
#pragma omp parallel for schedule(static)
    for (int b = 0; b < batch; ++b) {
        int st = blocktri_solve(N, bs, wb, A + b * sA, B + b * sB, E + b * sE,
                                F + b * sF, r + b * sr, rb + b * srb,
                                X + b * sr, xb + b * srb);
        if (st != 0) {
#pragma omp critical
            if (status == 0) status = st;
        }
    }
    return status;
}

}  // extern "C"
