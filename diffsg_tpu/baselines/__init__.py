from .gd import co_gd_solve, msr_gd_solve, nu_gd_solve
from .mtfnn import (
    MLP, mtfnn_co_model, mtfnn_msr_model, mtfnn_nu_model,
    load_mtfnn_ckpt, train_mtfnn, MTFNNConfig,
)
from .ppo import PPOAgent, PPOConfig, train_ppo, ppo_predict, load_ppo_ckpt, orthogonal_ppo_init
from . import gekko_oracle
from .waterfilling import waterfilling
from .co_exact import (co_exact_solve, co_analytic_decode,
                       co_optimal_allocation, co_soft_cost,
                       co_ranked_decode)
