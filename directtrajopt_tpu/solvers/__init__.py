from .canonical import CanonicalNLP, make_nlp
from .ipm import IPMResult, IPMState, ipm_solve
from .options import IPMOptions
from .solve import SolveResult, solve, solve_batch, solve_jit

__all__ = [
    "CanonicalNLP",
    "IPMOptions",
    "IPMResult",
    "IPMState",
    "SolveResult",
    "ipm_solve",
    "make_nlp",
    "solve",
    "solve_batch",
    "solve_jit",
]
