"""Argparse generation from traits.

Rebuild of ``src/toast/config/cli.py:148-509``: every trait of every
operator/template becomes a ``--name.trait`` option; ``--config`` files
merge left-to-right, then CLI options override.
"""

from __future__ import annotations

import argparse
from collections import OrderedDict

from .formats import load_config as _load_file
from .formats import merge_config
from .traits import build_config, string_to_trait, trait_to_string


def add_config_args(parser, objects):
    """Add --<name>.<trait> options for each object's traits."""
    for obj in objects:
        for tname, trait in obj.traits().items():
            if tname in ("name", "kernel_implementation"):
                continue
            opt = f"--{obj.name}.{tname}"
            default = getattr(obj, tname)
            helpmsg = trait.help or ""
            if isinstance(default, bool):
                parser.add_argument(
                    opt,
                    required=False,
                    default=None,
                    type=lambda x: x.lower() in ("1", "true", "yes"),
                    help=f"{helpmsg} (default: {default})",
                )
            else:
                parser.add_argument(
                    opt,
                    required=False,
                    default=None,
                    type=str,
                    help=f"{helpmsg} (default: {trait_to_string(default)})",
                )


def args_update_config(args, conf, objects):
    """Apply parsed CLI overrides onto a merged config dict."""
    remaining = {}
    by_name = {obj.name: obj for obj in objects}
    for key, value in vars(args).items():
        if "." in key:
            objname, _, tname = key.partition(".")
            if objname in by_name:
                if value is not None:
                    section = getattr(
                        type(by_name[objname]), "config_section", "misc"
                    )
                    conf.setdefault(section, OrderedDict())
                    conf[section].setdefault(objname, OrderedDict())
                    conf[section][objname][tname] = value
                continue
        remaining[key] = value
    return conf, remaining


def parse_config(
    parser=None,
    operators=(),
    templates=(),
    prefix="",
    opts=None,
):
    """Full config pipeline: defaults -> config files -> CLI overrides.

    Returns (config dict, remaining argparse namespace, jobargs namespace).
    """
    if parser is None:
        parser = argparse.ArgumentParser(description="TOAST-TPU pipeline")
    objects = list(operators) + list(templates)
    add_config_args(parser, objects)
    parser.add_argument(
        "--config", type=str, nargs="+", required=False, help="config files"
    )
    parser.add_argument(
        "--defaults_toml", type=str, required=False, help="dump defaults and exit"
    )
    parser.add_argument("--job_group_size", type=int, required=False, default=0)
    args = parser.parse_args(args=opts)

    conf = build_config(objects)
    if args.defaults_toml:
        from .formats import dump_toml

        dump_toml(args.defaults_toml, conf)
    if args.config:
        for path in args.config:
            conf = merge_config(conf, _load_file(path))
    conf, remaining = args_update_config(args, conf, objects)
    import types

    jobargs = types.SimpleNamespace(group_size=args.job_group_size)
    ns = types.SimpleNamespace(
        **{k: v for k, v in remaining.items() if k not in ("config", "defaults_toml")}
    )
    return conf, ns, jobargs
