from .base import Task, sample_solutions, sample_best_of_n, evaluate
from .msr import MSR, MSR_TEMP
from .co import CO, CO_ANALYTIC
from .nu import NU

TASKS = {"msr": MSR, "msr_temp": MSR_TEMP, "co": CO, "co_analytic": CO_ANALYTIC, "nu": NU}
