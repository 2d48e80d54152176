"""circuitsimulator_tpu: a TPU-native SPICE-class circuit simulation engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of the C++
reference simulator ZyuRao/CircuitSimulator (see SURVEY.md at the repo root):
SPICE netlist frontend -> flat device-parameter arrays -> vectorized MNA
stamp assembly -> damped-Newton DC operating point -> Backward-Euler
transient -> steady state, with vmap Monte-Carlo batching and jax.sharding
multi-chip scaling.
"""

from .api import Simulator
from .utils.options import SolverOptions, DEFAULT_OPTIONS
from .netlist.parser import parse_netlist, parse_netlist_text
from .ir.lower import lower

__version__ = "0.1.0"

__all__ = [
    "Simulator", "SolverOptions", "DEFAULT_OPTIONS",
    "parse_netlist", "parse_netlist_text", "lower",
]
