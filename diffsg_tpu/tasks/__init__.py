from .base import Task, sample_solutions, sample_best_of_n, evaluate
from .msr import MSR
from .co import CO, CO_ANALYTIC
from .nu import NU

TASKS = {"msr": MSR, "co": CO, "co_analytic": CO_ANALYTIC, "nu": NU}
