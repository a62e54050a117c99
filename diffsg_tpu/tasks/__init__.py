from .base import Task, sample_solutions, sample_best_of_n, evaluate
from .msr import MSR, MSR_TEMP, MSR_WF, MSR_BUDGET
from .co import CO, CO_ANALYTIC, CO_DIRECT, CO_RANKED
from .nu import NU, NU_DIRECT, NU_BUDGET, NU_GEO
from .multi import MULTI_TASKS, MULTI_MSR, MULTI_CO, MULTI_NU

TASKS = {"msr": MSR, "msr_temp": MSR_TEMP, "msr_wf": MSR_WF,
         "msr_budget": MSR_BUDGET,
         "co": CO, "co_analytic": CO_ANALYTIC, "co_direct": CO_DIRECT,
         "co_ranked": CO_RANKED,
         "nu": NU, "nu_direct": NU_DIRECT, "nu_budget": NU_BUDGET,
         "nu_geo": NU_GEO,
         **MULTI_TASKS}
