from .schedule import Schedule, cosine_beta_schedule, linear_beta_schedule, schedule_from_betas, cosine_schedule
from .ddpm import q_sample, ddpm_loss, cfg_sample, SampleTrace
from . import legacy
from .ddim import ddim_sample, respaced_steps
