// ctypes bridge around the ACTUAL vendored qpOASES of the reference tree.
//
// The reference solves its MPC QP with qpOASES::QProblem under
// Options::setToMPC() and PL_NONE (SolverMPC.cpp:702-712):
//
//     qpOASES::QProblem problem_red(new_vars, new_cons);
//     qpOASES::Options op;  op.setToMPC();  op.printLevel = PL_NONE;
//     problem_red.setOptions(op);
//     problem_red.init(H_red, g_red, A_red, NULL, NULL, lb_red, ub_red, nWSR);
//     problem_red.getPrimalSolution(q_red);
//
// This file is a thin extern-"C" wrapper exposing exactly that call so the
// Python parity tests (tests/test_qpoases_parity.py) can assert the
// BASELINE bar literally: force trajectories within 1e-3 N of qpOASES.
// It is ORIGINAL code; qpOASES itself is compiled out-of-tree from the
// read-only reference checkout (see hector/qp/ref_check.py:_build_qpoases),
// never copied into this repository.

#include <qpOASES.hpp>

extern "C" {

// Returns 0 on SUCCESSFUL_RETURN; otherwise the qpOASES returnValue code.
// H (nv*nv), g (nv), A (nc*nv) row-major doubles; lbA/ubA (nc) constraint
// bounds (variable bounds are NULL, as in the reference call).  On success
// x_out (nv) holds the primal solution and nwsr_out the working-set
// recalculation count actually used.
int qpoases_solve(int nv, int nc,
                  const double* H, const double* g, const double* A,
                  const double* lbA, const double* ubA,
                  int nwsr, double* x_out, int* nwsr_out) {
    USING_NAMESPACE_QPOASES
    QProblem problem(nv, nc);
    Options op;
    op.setToMPC();
    op.printLevel = PL_NONE;
    problem.setOptions(op);
    int_t nWSR = nwsr;
    returnValue rval = problem.init(H, g, A,
                                    /*lb=*/0, /*ub=*/0,
                                    lbA, ubA, nWSR);
    if (nwsr_out) *nwsr_out = static_cast<int>(nWSR);
    if (rval != SUCCESSFUL_RETURN) return static_cast<int>(rval);
    problem.getPrimalSolution(x_out);
    return 0;
}

}  // extern "C"
