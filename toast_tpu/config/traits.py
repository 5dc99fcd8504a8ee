"""Trait-based configuration base class.

Rebuild of ``src/toast/traits.py`` on traitlets (available in this
environment): every operator/template class declares typed traits which are
simultaneously python attributes, config-file entries, and CLI options.
Adds astropy-free :class:`Quantity`/:class:`Unit` trait types
(reference ``traits.py:154-219``) backed by
:mod:`toast_tpu.utils.units`.
"""

from __future__ import annotations

import copy
from collections import OrderedDict

import traitlets
from traitlets import (
    Bool,
    Callable,
    Dict,
    Float,
    HasTraits,
    Instance,
    Int,
    List,
    Set,
    TraitError,
    TraitType,
    Tuple,
    Unicode,
    Undefined,
    signature_has_traits,
)

from ..utils import units as u
from ..utils.units import Quantity as Qty
from ..utils.units import Unit as UnitType
from ..utils.units import quantity_from_string, unit_from_string


class Quantity(TraitType):
    """A trait holding a toast_tpu Quantity (value + unit)."""

    default_value = None
    info_text = "a Quantity (value with unit)"

    def __init__(self, default_value=Undefined, **kwargs):
        super().__init__(default_value=default_value, **kwargs)

    def validate(self, obj, value):
        if value is None:
            if self.allow_none:
                return None
            self.error(obj, value)
        if isinstance(value, Qty):
            return value
        if isinstance(value, str):
            try:
                return quantity_from_string(value)
            except ValueError:
                self.error(obj, value)
        if isinstance(value, (int, float)):
            return Qty(float(value), u.dimensionless)
        self.error(obj, value)


class Unit(TraitType):
    """A trait holding a toast_tpu Unit."""

    default_value = u.dimensionless
    info_text = "a Unit"

    def validate(self, obj, value):
        if value is None:
            if self.allow_none:
                return None
            self.error(obj, value)
        if isinstance(value, UnitType):
            return value
        if isinstance(value, str):
            try:
                return unit_from_string(value)
            except ValueError:
                self.error(obj, value)
        self.error(obj, value)


def trait_to_string(value):
    """Encode a trait value for config files."""
    if value is None:
        return "None"
    if isinstance(value, Qty):
        return f"{value.value} {value.unit.name} Quantity"
    if isinstance(value, UnitType):
        return f"{value.name} Unit"
    return value


def string_to_trait(text):
    """Decode a config-file string into a python value."""
    if not isinstance(text, str):
        return text
    if text == "None":
        return None
    if text.endswith(" Quantity"):
        return quantity_from_string(text[: -len(" Quantity")])
    if text.endswith(" Unit"):
        return unit_from_string(text[: -len(" Unit")].strip())
    return text


def _coerce_trait_value(trait, value):
    """Parse config/CLI strings into the trait's python type."""
    if value is None or not isinstance(value, str):
        return value
    if isinstance(trait, traitlets.Int):
        return int(value)
    if isinstance(trait, traitlets.Float):
        return float(value)
    if isinstance(trait, traitlets.Bool):
        return value.lower() in ("1", "true", "yes", "on")
    if isinstance(trait, (traitlets.List, traitlets.Set, traitlets.Tuple, traitlets.Dict)):
        import json as _json

        try:
            return _json.loads(value)
        except (ValueError, TypeError):
            return value
    return value


class TraitConfig(HasTraits):
    """Base class for all configurable objects (operators, templates).

    Mirrors the reference ``TraitConfig`` (``src/toast/traits.py:244``):
    ``name``/``enabled`` traits, class+instance config dictionaries, and
    round-trip through plain nested dicts usable by TOML/JSON/YAML.
    """

    name = Unicode(None, allow_none=True, help="The 'name' of this object")
    enabled = Bool(True, help="If True, this object is used")
    kernel_implementation = Unicode(
        "jax", help="Which kernel implementation to use (jax or numpy)"
    )

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        if self.name is None:
            self.name = type(self).__qualname__

    # -- config serialization ---------------------------------------------
    @classmethod
    def class_config(cls):
        """Default configuration dict for this class."""
        out = OrderedDict()
        out["class"] = f"{cls.__module__}.{cls.__qualname__}"
        for tname, trait in cls.class_traits().items():
            if tname == "name":
                continue
            out[tname] = trait_to_string(trait.default_value)
        return out

    def get_config(self):
        """Current configuration of this instance."""
        out = OrderedDict()
        out["class"] = f"{type(self).__module__}.{type(self).__qualname__}"
        for tname in self.trait_names():
            if tname == "name":
                continue
            out[tname] = trait_to_string(getattr(self, tname))
        return out

    @classmethod
    def from_config(cls, name, props):
        """Instantiate from a config dict (ignoring the class key)."""
        kwargs = {"name": name}
        traits = cls.class_traits()
        for k, v in props.items():
            if k == "class" or k not in traits:
                continue
            decoded = string_to_trait(v)
            if decoded is None and not traits[k].allow_none:
                continue
            kwargs[k] = _coerce_trait_value(traits[k], decoded)
        return cls(**kwargs)

    @classmethod
    def get_class_config_path(cls):
        return f"/{cls.__qualname__}"

    def __repr__(self):
        vals = ", ".join(
            f"{k}={getattr(self, k)!r}"
            for k in sorted(self.trait_names())
            if k not in ("kernel_implementation",)
        )
        return f"{type(self).__qualname__}({vals})"


def build_config(objects):
    """Merge object configs into {section: {name: conf}} (reference traits.py:393).

    Operators go under "operators", templates under "templates", everything
    else under "misc" — determined by class attribute ``config_section``.
    """
    conf = OrderedDict()
    for obj in objects:
        section = getattr(type(obj), "config_section", "misc")
        conf.setdefault(section, OrderedDict())
        conf[section][obj.name] = obj.get_config()
    return conf


def create_from_config(conf):
    """Instantiate the object graph from a merged config.

    Returns a namespace with one attribute per section, each a namespace of
    instantiated objects (reference ``traits.py:562``).
    """
    import types

    from ..utils.misc import import_from_name

    out = {}
    for section, entries in conf.items():
        objs = {}
        for name, props in entries.items():
            if not isinstance(props, dict) or "class" not in props:
                continue
            cls = import_from_name(props["class"])
            objs[name] = cls.from_config(name, props)
        out[section] = types.SimpleNamespace(**objs)
    return types.SimpleNamespace(**out)
