"""Config/traits layer."""

from .cli import add_config_args, args_update_config, parse_config
from .formats import dump_config, load_config, merge_config
from .traits import (
    Bool,
    Callable,
    Dict,
    Float,
    Instance,
    Int,
    List,
    Quantity,
    Set,
    TraitConfig,
    Tuple,
    Unicode,
    Unit,
    build_config,
    create_from_config,
)
