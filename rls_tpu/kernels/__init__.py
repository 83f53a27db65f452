from .auto import solve_batched_fast
from .admm_tv_fused import admm_tv_fused, solve_admm_tv_fused
from .cgnr_fused import check_cgnr_fused, solve_cgnr_fused
from .admm_tv_tiled import admm_tv_tiled, solve_admm_tv_tiled
from .fista_l1_dft_fused import fista_l1_dft_fused, solve_fista_l1_dft_fused
from .sense_fused import fista_l21_sense_fused, solve_fista_l21_sense_fused
from .fista_tv_fused import fista_tv_fused, solve_fista_tv_fused, solve_pgm_tv_fused
from .fista_tv_tiled import fista_tv_tiled, solve_fista_tv_tiled
from .kaczmarz_greedy import (
    check_kaczmarz_greedy,
    solve_kaczmarz_greedy,
)
from .kaczmarz_pallas import (
    kaczmarz_solve_pallas,
    kaczmarz_sweep_pallas,
    solve_kaczmarz_streamed,
)
from .pdhg_fused import check_pdhg_fused, pdhg_fused, solve_pdhg_fused
from .pgm_dense_fused import check_pgm_dense_fused, solve_pgm_dense_fused
from .splitbregman_fused import (
    splitbregman_l1_tv_sense_fused,
    solve_splitbregman_l1_tv_fused,
)
from .tv_pallas import prox_tv2d_fgp_pallas

__all__ = [
    "splitbregman_l1_tv_sense_fused",
    "solve_splitbregman_l1_tv_fused",
    "kaczmarz_solve_pallas",
    "solve_kaczmarz_greedy",
    "solve_kaczmarz_streamed",
    "solve_batched_fast",
    "check_cgnr_fused",
    "solve_cgnr_fused",
    "check_pdhg_fused",
    "check_pgm_dense_fused",
    "solve_pgm_dense_fused",
    "pdhg_fused",
    "solve_pdhg_fused",
    "admm_tv_fused",
    "fista_l1_dft_fused",
    "solve_fista_l1_dft_fused",
    "fista_l21_sense_fused",
    "solve_fista_l21_sense_fused",
    "solve_admm_tv_fused",
    "admm_tv_tiled",
    "solve_admm_tv_tiled",
    "prox_tv2d_fgp_pallas",
    "kaczmarz_sweep_pallas",
    "fista_tv_fused",
    "fista_tv_tiled",
    "solve_fista_tv_fused",
    "solve_fista_tv_tiled",
    "solve_pgm_tv_fused",
]
