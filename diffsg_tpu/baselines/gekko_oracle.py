"""GEKKO offline oracle (gated — gekko is an optional dependency).

Per BASELINE.json the GEKKO comparator stays an offline oracle rather than a
JAX port: it is a per-sample MINLP/NLP solve (~9 s/sample on the authors'
machine, ``baselines/GEKKO.py:192-201``) whose published numbers serve as
the optimality reference:

  CO  exceeded ratio 1.005359 @ 8.96 s/sample   (APOPT MINLP)
  MSR-3c less ratio 1.0000000003 @ 8.63 s/sample (IPOPT NLP)
  MSR-8c less ratio 1.0037998 @ 25.02 s/sample
  NU  less ratio 0.485004 @ 9.59 s/sample        (IPOPT + SIC ordering)

Problem formulations follow the task definitions (ops/objectives.py); solver
settings mirror the reference (APOPT branch options for CO, ma97 for NLPs).
"""

from __future__ import annotations

import numpy as np

PUBLISHED = {
    "co": {"exceeded_ratio": 1.005359, "sec_per_sample": 8.96},
    "msr_3c": {"less_ratio": 1.0000000003, "sec_per_sample": 8.63},
    "msr_8c": {"less_ratio": 1.0037998, "sec_per_sample": 25.02},
    "nu": {"less_ratio": 0.485004, "sec_per_sample": 9.59},
}


def _require_gekko():
    try:
        from gekko import GEKKO  # noqa: F401

        return GEKKO
    except ImportError as e:  # pragma: no cover - environment dependent
        raise ImportError(
            "The GEKKO oracle needs the optional 'gekko' package "
            "(pip install gekko). Published oracle numbers are available "
            "as diffsg_tpu.baselines.gekko_oracle.PUBLISHED."
        ) from e


def co_solve_one(x: np.ndarray) -> np.ndarray:
    """MINLP: binary offload decisions + continuous shares for one sample.

    x: (9,) derived CO features for 3 nodes. Returns (3,) allocation shares
    (share * decision, like the reference ``GEKKO.py:14-40``).
    """
    GEKKO = _require_gekko()
    m = GEKKO(remote=False)
    m.options.SOLVER = 1  # APOPT MINLP
    m.solver_options = [
        "minlp_maximum_iterations 500",
        "minlp_max_iter_with_int_sol 10",
        "minlp_as_nlp 0",
        "nlp_maximum_iterations 50",
        "minlp_branch_method 1",
        "minlp_integer_tol 0.05",
        "minlp_gap_tol 0.01",
    ]
    shares = [m.Var(value=v, lb=0, ub=1) for v in (0.3, 0.35, 0.35)]
    decisions = [m.Var(value=0, lb=0, ub=1, integer=True) for _ in range(3)]
    m.Equation(sum(s * d for s, d in zip(shares, decisions)) <= 1)
    cost = 0
    for i, (s, d) in enumerate(zip(shares, decisions)):
        local, trans, execu = x[3 * i], x[3 * i + 1], x[3 * i + 2]
        cost = cost + (1 - d) * local + d * (trans + execu / s)
    m.Obj(cost)
    m.solve(disp=False)
    return np.array([float(s.VALUE[0]) * float(d.VALUE[0])
                     for s, d in zip(shares, decisions)])


def msr_solve_one(g: np.ndarray, W: float) -> np.ndarray:
    """NLP: maximize sum rate subject to sum(p) == W (``GEKKO.py:81-96``)."""
    GEKKO = _require_gekko()
    M = len(g)
    m = GEKKO(remote=False)
    m.options.SOLVER = 3  # IPOPT
    m.solver_options = ["linear_solver ma97"]
    ps = [m.Var(value=W / M, lb=0.01, ub=W - (M - 1) * 0.01) for _ in range(M)]
    m.Equation(m.sum(ps) == W)
    m.Obj(-m.sum([m.log(1 + g[i] * ps[i]) / np.log(2) for i in range(M)]))
    m.solve(disp=False)
    return np.array([float(p.VALUE[0]) for p in ps])


def nu_solve_one(coords: np.ndarray, P_sum: float = 18.0) -> np.ndarray:
    """NLP with SIC ordering constraints for K=3 (``GEKKO.py:126-148``)."""
    GEKKO = _require_gekko()
    x1, y1, x2, y2, x3, y3 = coords
    m = GEKKO(remote=False)
    m.options.SOLVER = 3
    m.solver_options = ["linear_solver ma97"]
    u1 = m.Var(value=200, lb=-200, ub=600)
    u2 = m.Var(value=200, lb=-200, ub=600)
    p = [m.Var(value=P_sum / 3, lb=0.1, ub=P_sum - 0.2) for _ in range(3)]
    h = [
        m.sqrt(60 / (22500 + (u1 - xx) ** 2 + (u2 - yy) ** 2))
        for xx, yy in ((x1, y1), (x2, y2), (x3, y3))
    ]
    # SIC: user i is interfered by users with larger power (weaker channel)
    sinr = []
    for i in range(3):
        interf = sum(m.if2(p[j] - p[i], 1, 0) * p[j] for j in range(3) if j != i)
        sinr.append(p[i] / (interf + 110 / (h[i] ** 2)))
    m.Equation(sum(p) == P_sum)
    m.Equation((h[0] - h[1]) * (p[1] - p[0]) >= 0)
    m.Equation((h[0] - h[2]) * (p[2] - p[0]) >= 0)
    m.Equation((h[2] - h[1]) * (p[1] - p[2]) >= 0)
    m.Obj(-sum(m.log(1 + s) / np.log(2) for s in sinr))
    m.solve(disp=False)
    return np.array([u1.VALUE[0], u2.VALUE[0]] + [pp.VALUE[0] for pp in p],
                    dtype=float)
