"""Config file round-trip: TOML / JSON / YAML.

Rebuild of ``src/toast/config/{toml,json,yaml}.py``.  TOML reading uses the
stdlib ``tomllib``; writing uses a small built-in emitter (no tomlkit in
this environment).  All values are string-encoded typed values (see
``toast_tpu.config.traits.trait_to_string``).
"""

from __future__ import annotations

import json
import tomllib
from collections import OrderedDict


def _toml_escape(s):
    return s.replace("\\", "\\\\").replace('"', '\\"')


def _emit_toml(conf, lines, prefix=()):
    scalars = []
    tables = []
    for k, v in conf.items():
        if isinstance(v, dict):
            tables.append((k, v))
        else:
            scalars.append((k, v))
    for k, v in scalars:
        if isinstance(v, bool):
            sval = "true" if v else "false"
        elif isinstance(v, (int, float)):
            sval = repr(v)
        elif isinstance(v, (list, tuple)):
            sval = "[" + ", ".join(f'"{_toml_escape(str(x))}"' for x in v) + "]"
        elif v is None:
            sval = '"None"'
        else:
            sval = f'"{_toml_escape(str(v))}"'
        lines.append(f'"{_toml_escape(str(k))}" = {sval}')
    for k, v in tables:
        path = prefix + (str(k),)
        lines.append("")
        lines.append("[" + ".".join(f'"{_toml_escape(p)}"' for p in path) + "]")
        _emit_toml(v, lines, path)


def dump_toml(path, conf):
    lines = ["# TOAST-TPU configuration"]
    _emit_toml(conf, lines)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def load_toml(path):
    with open(path, "rb") as f:
        return tomllib.load(f)


def dump_json(path, conf):
    with open(path, "w") as f:
        json.dump(conf, f, indent=2)


def load_json(path):
    with open(path) as f:
        return json.load(f, object_pairs_hook=OrderedDict)


def dump_yaml(path, conf):
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(_to_plain(conf), f, sort_keys=False)


def load_yaml(path):
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def _to_plain(conf):
    if isinstance(conf, dict):
        return {k: _to_plain(v) for k, v in conf.items()}
    if isinstance(conf, (list, tuple)):
        return [_to_plain(v) for v in conf]
    return conf


def merge_config(base, update):
    """Recursive merge (later wins), reference config/__init__ behavior."""
    out = OrderedDict(base)
    for k, v in update.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_config(out[k], v)
        else:
            out[k] = v
    return out


def load_config(path):
    """Load a config file by extension."""
    p = str(path)
    if p.endswith(".toml"):
        return load_toml(p)
    if p.endswith(".json"):
        return load_json(p)
    if p.endswith((".yaml", ".yml")):
        return load_yaml(p)
    raise ValueError(f"unknown config format: {p}")


def dump_config(path, conf):
    p = str(path)
    if p.endswith(".toml"):
        return dump_toml(p, conf)
    if p.endswith(".json"):
        return dump_json(p, conf)
    if p.endswith((".yaml", ".yml")):
        return dump_yaml(p, conf)
    raise ValueError(f"unknown config format: {p}")
