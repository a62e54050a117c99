from .base import Task, sample_solutions, evaluate
from .msr import MSR
from .co import CO
from .nu import NU

TASKS = {"msr": MSR, "co": CO, "nu": NU}
