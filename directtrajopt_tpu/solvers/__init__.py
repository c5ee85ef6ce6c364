from .callbacks import (
    IPMCallbacks,
    best_fidelity_tracker,
    fidelity_stop,
    say_hello,
    stop_iteration,
    telemetry,
)
from .canonical import CanonicalNLP, make_nlp
from .ipm import TELEMETRY_COLUMNS, IPMResult, IPMState, ipm_solve, WarmStart
from .options import IPMOptions
from .solve import (
    SolveResult,
    get_default_options,
    remove_slack_variables,
    set_default_options,
    solve,
    solve_batch,
    solve_jit,
    solve_polished,
    solve_batch_polished,
    solve_batch_scheduled,
    solve_batch_compact,
    cast_problem,
)

__all__ = [
    "CanonicalNLP",
    "IPMCallbacks",
    "best_fidelity_tracker",
    "fidelity_stop",
    "say_hello",
    "stop_iteration",
    "telemetry",
    "TELEMETRY_COLUMNS",
    "WarmStart",
    "IPMOptions",
    "IPMResult",
    "IPMState",
    "SolveResult",
    "ipm_solve",
    "make_nlp",
    "solve",
    "solve_batch",
    "remove_slack_variables",
    "get_default_options",
    "set_default_options",
    "solve_jit",
    "solve_polished",
    "solve_batch_polished",
    "solve_batch_scheduled",
    "solve_batch_compact",
    "cast_problem",
]
