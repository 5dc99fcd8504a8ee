"""Lightweight unit / quantity system (astropy-free).

The reference framework (hpc4cmb/toast) leans on ``astropy.units`` for
configuration values, detector data units, and noise model parameters
(e.g. ``src/toast/traits.py:154-219``, ``src/toast/noise.py``).  astropy is
not available in this environment, so we provide a small, exact replacement
covering the dimensions TOAST actually uses: temperature, time, angle,
frequency, length, and their rational powers (NET is K * sqrt(s)).

Design notes
------------
* A :class:`Unit` is a scale factor to coherent base units plus a vector of
  rational exponents over the base dimensions ``(K, s, rad, m, kg, A)``.
* A :class:`Quantity` wraps a numpy scalar/array plus a Unit.  Arithmetic is
  implemented directly; no ufunc dispatch magic is required by the rest of
  the framework.
* String parsing supports the forms used in configs: ``"1.5 deg"``,
  ``"10.0 mK"``, ``"0.1 Hz"``, ``"K * sqrt(s)"``, ``"uK2"``/``"K**2"``.
"""

from __future__ import annotations

from fractions import Fraction
import math
import re

import numpy as np

# Base dimension order: temperature, time, angle, length, mass, current
_NDIM = 6
_DIMLESS = (Fraction(0),) * _NDIM


def _dims(**kw):
    names = ["K", "s", "rad", "m", "kg", "A"]
    return tuple(Fraction(kw.get(n, 0)) for n in names)


class Unit:
    """A physical unit: scale factor times rational powers of base dims."""

    __slots__ = ("scale", "dims", "_name")

    def __init__(self, scale=1.0, dims=_DIMLESS, name=None):
        self.scale = float(scale)
        self.dims = tuple(Fraction(d) for d in dims)
        self._name = name

    # -- algebra ----------------------------------------------------------
    def __mul__(self, other):
        if isinstance(other, Unit):
            return Unit(
                self.scale * other.scale,
                tuple(a + b for a, b in zip(self.dims, other.dims)),
            )
        if isinstance(other, (int, float)):
            return Quantity(other, self)
        return NotImplemented

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, Unit):
            return Unit(
                self.scale / other.scale,
                tuple(a - b for a, b in zip(self.dims, other.dims)),
            )
        return NotImplemented

    def __rtruediv__(self, other):
        if isinstance(other, (int, float)):
            return Quantity(other, self ** -1)
        return NotImplemented

    def __pow__(self, p):
        p = Fraction(p).limit_denominator(12) if isinstance(p, float) else Fraction(p)
        return Unit(self.scale ** float(p), tuple(d * p for d in self.dims))

    def __eq__(self, other):
        if not isinstance(other, Unit):
            return NotImplemented
        return self.dims == other.dims and math.isclose(
            self.scale, other.scale, rel_tol=1e-12
        )

    def __hash__(self):
        return hash((round(math.log10(self.scale) if self.scale > 0 else 0.0, 9), self.dims))

    def compatible(self, other):
        return isinstance(other, Unit) and self.dims == other.dims

    def conversion_factor(self, other):
        if not self.compatible(other):
            raise ValueError(f"incompatible units: {self} -> {other}")
        return self.scale / other.scale

    @property
    def name(self):
        if self._name is not None:
            return self._name
        canon = _canonical_name(self)
        return canon if canon is not None else self._compose_name()

    def _compose_name(self):
        if self.dims == _DIMLESS and self.scale == 1.0:
            return ""
        parts = []
        if self.scale != 1.0:
            parts.append(f"{self.scale:g}")
        base = ["K", "s", "rad", "m", "kg", "A"]
        for b, d in zip(base, self.dims):
            if d == 0:
                continue
            if d == 1:
                parts.append(b)
            elif d.denominator == 1:
                parts.append(f"{b}**{d.numerator}")
            else:
                parts.append(f"{b}**({d.numerator}/{d.denominator})")
        return " ".join(parts)

    def __repr__(self):
        return f"Unit({self.name!r})"

    def __str__(self):
        return self.name


# -- unit registry ---------------------------------------------------------

dimensionless = Unit(1.0, _DIMLESS, name="")

_REGISTRY: dict[str, Unit] = {}
_CANONICAL: dict[tuple, str] = {}


def _register(name, unit, canonical=False):
    u = Unit(unit.scale, unit.dims, name=name)
    _REGISTRY[name] = u
    key = (round(math.log10(u.scale) if u.scale > 0 else 0.0, 9), u.dims)
    if canonical and key not in _CANONICAL:
        _CANONICAL[key] = name
    return u


def _canonical_name(unit):
    key = (round(math.log10(unit.scale) if unit.scale > 0 else 0.0, 9), unit.dims)
    return _CANONICAL.get(key)


_SI_PREFIX = {
    "a": 1e-18, "f": 1e-15, "p": 1e-12, "n": 1e-9, "u": 1e-6, "m": 1e-3,
    "c": 1e-2, "d": 1e-1, "": 1.0, "da": 1e1, "h": 1e2, "k": 1e3,
    "M": 1e6, "G": 1e9, "T": 1e12, "P": 1e15,
}

K = _register("K", Unit(1.0, _dims(K=1)), canonical=True)
second = _register("s", Unit(1.0, _dims(s=1)), canonical=True)
rad = _register("rad", Unit(1.0, _dims(rad=1)), canonical=True)
meter = _register("m", Unit(1.0, _dims(m=1)), canonical=True)
kg = _register("kg", Unit(1.0, _dims(kg=1)), canonical=True)
ampere = _register("A", Unit(1.0, _dims(A=1)), canonical=True)
Hz = _register("Hz", Unit(1.0, _dims(s=-1)), canonical=True)

for _p, _f in _SI_PREFIX.items():
    if _p == "":
        continue
    _register(f"{_p}K", Unit(_f, _dims(K=1)), canonical=(_p in ("m", "u", "n")))
    _register(f"{_p}Hz", Unit(_f, _dims(s=-1)), canonical=(_p in ("m", "k", "M", "G")))
    _register(f"{_p}s", Unit(_f, _dims(s=1)), canonical=(_p in ("m", "u", "n")))
    _register(f"{_p}m", Unit(_f, _dims(m=1)), canonical=(_p in ("m", "c", "k")))

s = second
mK = _REGISTRY["mK"]
uK = _REGISTRY["uK"]
nK = _REGISTRY["nK"]
mHz = _REGISTRY["mHz"]
kHz = _REGISTRY["kHz"]
GHz = _REGISTRY["GHz"]
km = _REGISTRY["km"]
ms = _REGISTRY["ms"]

deg = _register("deg", Unit(math.pi / 180.0, _dims(rad=1)), canonical=True)
arcmin = _register("arcmin", Unit(math.pi / 180.0 / 60.0, _dims(rad=1)), canonical=True)
arcsec = _register("arcsec", Unit(math.pi / 180.0 / 3600.0, _dims(rad=1)), canonical=True)
minute = _register("min", Unit(60.0, _dims(s=1)), canonical=True)
hour = _register("hour", Unit(3600.0, _dims(s=1)), canonical=True)
day = _register("day", Unit(86400.0, _dims(s=1)), canonical=True)
_register("h", Unit(3600.0, _dims(s=1)))

# Composite units commonly used by TOAST noise models
K_sqrt_s = _register("K sqrt(s)", Unit(1.0, _dims(K=1, s=Fraction(1, 2))), canonical=True)
uK_sqrt_s = _register("uK sqrt(s)", Unit(1e-6, _dims(K=1, s=Fraction(1, 2))))
K2_s = _register("K**2 s", Unit(1.0, _dims(K=2, s=1)), canonical=True)
uK2_s = _register("uK**2 s", Unit(1e-12, _dims(K=2, s=1)))
mm = _REGISTRY["mm"]
_register("", dimensionless, canonical=True)
_register("dimensionless", dimensionless)


_TOKEN_RE = re.compile(
    r"\s*(sqrt\(\s*(?P<sq>[A-Za-z]+)\s*\)|(?P<nm>[A-Za-z]+)(\*\*|\^)?"
    r"(?P<pw>\(?-?\d+(\s*/\s*\d+)?\)?)?)\s*(?P<op>[*/])?"
)
_SCALE_RE = re.compile(r"\s*(?P<sc>[0-9]+\.?[0-9]*([eE][+-]?[0-9]+)?)\s*")


def unit_to_string(unit):
    """Serialize a Unit to a string both :func:`unit_from_string` and
    astropy's generic-format parser accept.

    Canonical registered names are used directly ("deg", "K sqrt(s)" →
    "K s(1/2)" spelled the astropy way by callers that need it); anything
    else becomes ``<scale> <base units with ** powers>`` — astropy's
    generic format accepts a leading numeric factor (e.g.
    ``0.017453292519943295 rad / s`` for deg/s).
    """
    name = _canonical_name(unit)
    if name is not None:
        return name
    num, den = [], []
    base = ["K", "s", "rad", "m", "kg", "A"]
    for b, d in zip(base, unit.dims):
        if d == 0:
            continue
        mag = abs(d)
        if mag == 1:
            part = b
        elif mag.denominator == 1:
            part = f"{b}**{mag.numerator}"
        else:
            part = f"{b}**({mag.numerator}/{mag.denominator})"
        (num if d > 0 else den).append(part)
    text = " ".join(num) if num else "1"
    if den:
        text += " / " + " / ".join(den) if len(den) > 1 else f" / {den[0]}"
    if unit.scale != 1.0:
        text = f"{unit.scale!r} {text}"
    return text


def unit_from_string(text):
    """Parse a unit expression: optional leading numeric scale, names,
    powers, sqrt(), '*' and '/'."""
    if text is None:
        return dimensionless
    text = text.strip()
    if text in ("", "1", "dimensionless", "None"):
        return dimensionless
    if text in _REGISTRY:
        return _REGISTRY[text]
    result = Unit(1.0, _DIMLESS)
    pos = 0
    next_op = "*"
    mobj = _SCALE_RE.match(text)
    if mobj is not None and mobj.group("sc") not in (None, ""):
        # leading numeric factor (our own serializer and astropy both
        # emit these for non-canonical scales)
        result = Unit(float(mobj.group("sc")), _DIMLESS)
        pos = mobj.end()
        if pos < len(text) and text[pos] in "*/":
            next_op = text[pos]
            pos += 1
    while pos < len(text):
        mobj = _TOKEN_RE.match(text, pos)
        if mobj is None or mobj.end() == pos:
            raise ValueError(f"cannot parse unit {text!r} at position {pos}")
        if mobj.group("sq"):
            name = mobj.group("sq")
            power = Fraction(1, 2)
        else:
            name = mobj.group("nm")
            pw = mobj.group("pw")
            power = Fraction(pw.strip("()").replace(" ", "")) if pw else Fraction(1)
        if name not in _REGISTRY:
            raise ValueError(f"unknown unit {name!r} in {text!r}")
        term = _REGISTRY[name] ** power
        result = result * term if next_op == "*" else result / term
        next_op = mobj.group("op") or "*"
        pos = mobj.end()
    return result


class Quantity:
    """A numeric value (scalar or ndarray) with a Unit."""

    __slots__ = ("value", "unit")

    def __init__(self, value, unit=dimensionless):
        if isinstance(value, Quantity):
            q = value.to(unit if isinstance(unit, Unit) else unit_from_string(unit))
            self.value = q.value
            self.unit = q.unit
            return
        if isinstance(unit, str):
            unit = unit_from_string(unit)
        self.value = np.asarray(value) if not np.isscalar(value) else value
        self.unit = unit

    # -- conversion -------------------------------------------------------
    def to(self, unit):
        if isinstance(unit, str):
            unit = unit_from_string(unit)
        factor = self.unit.conversion_factor(unit)
        return Quantity(self.value * factor, unit)

    def to_value(self, unit=None):
        if unit is None:
            return self.value
        return self.to(unit).value

    @property
    def si(self):
        base = Unit(1.0, self.unit.dims)
        return self.to(base)

    # -- arithmetic -------------------------------------------------------
    def __add__(self, other):
        if isinstance(other, Quantity):
            return Quantity(self.value + other.to(self.unit).value, self.unit)
        if self.unit.dims == _DIMLESS:
            return Quantity(self.value * self.unit.scale + other, dimensionless)
        return NotImplemented

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, Quantity):
            return Quantity(self.value - other.to(self.unit).value, self.unit)
        if self.unit.dims == _DIMLESS:
            return Quantity(self.value * self.unit.scale - other, dimensionless)
        return NotImplemented

    def __rsub__(self, other):
        return (-1 * self).__add__(other)

    def __mul__(self, other):
        if isinstance(other, Quantity):
            return Quantity(self.value * other.value, self.unit * other.unit)
        if isinstance(other, Unit):
            return Quantity(self.value, self.unit * other)
        return Quantity(self.value * other, self.unit)

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, Quantity):
            return Quantity(self.value / other.value, self.unit / other.unit)
        if isinstance(other, Unit):
            return Quantity(self.value, self.unit / other)
        return Quantity(self.value / other, self.unit)

    def __rtruediv__(self, other):
        return Quantity(other / self.value, self.unit ** -1)

    def __pow__(self, p):
        return Quantity(self.value ** p, self.unit ** p)

    def __neg__(self):
        return Quantity(-self.value, self.unit)

    def __abs__(self):
        return Quantity(abs(self.value), self.unit)

    # -- comparison -------------------------------------------------------
    def _cmp_value(self, other):
        if isinstance(other, Quantity):
            return other.to(self.unit).value
        if self.unit.dims == _DIMLESS:
            return other / self.unit.scale
        raise TypeError(f"cannot compare Quantity[{self.unit}] with {type(other)}")

    def __eq__(self, other):
        try:
            return np.all(self.value == self._cmp_value(other))
        except (TypeError, ValueError):
            return NotImplemented

    def __hash__(self):
        v = self.value
        if isinstance(v, np.ndarray):
            v = v.tobytes()
        return hash((v, self.unit))

    def __lt__(self, other):
        return self.value < self._cmp_value(other)

    def __le__(self, other):
        return self.value <= self._cmp_value(other)

    def __gt__(self, other):
        return self.value > self._cmp_value(other)

    def __ge__(self, other):
        return self.value >= self._cmp_value(other)

    def __float__(self):
        if self.unit.dims != _DIMLESS:
            raise TypeError(f"cannot cast Quantity[{self.unit}] to float")
        return float(self.value) * self.unit.scale

    def __len__(self):
        return len(self.value)

    def __getitem__(self, key):
        return Quantity(self.value[key], self.unit)

    def __array__(self, dtype=None, copy=None):
        return np.asarray(self.value, dtype=dtype)

    def __repr__(self):
        return f"Quantity({self.value!r}, {self.unit.name!r})"

    def __str__(self):
        name = self.unit.name
        return f"{self.value} {name}" if name else f"{self.value}"


_QTY_RE = re.compile(r"^\s*(?P<num>[-+0-9.eE]+)\s*(?P<unit>.*)$")


def quantity_from_string(text):
    """Parse e.g. '1.5 deg', '10mK', '0.1 Hz', '5'."""
    if isinstance(text, Quantity):
        return text
    mobj = _QTY_RE.match(str(text))
    if mobj is None:
        raise ValueError(f"cannot parse quantity {text!r}")
    return Quantity(float(mobj.group("num")), unit_from_string(mobj.group("unit")))
