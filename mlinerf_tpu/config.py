"""Configuration system: YAML with ``_parent_`` inheritance and CLI dot-path
overrides, plus a string->class registry that replaces the reference's
importlib plugin loading.

Capability parity with the reference config stack
(``imaginaire/config.py:26-223``): attribute-style access, recursive merge,
strict CLI overrides (unknown keys are errors), ``--a.b=v`` / ``--a.b`` (True)
/ ``--a.b!`` (False) syntax, float-resolver fix for scientific notation, and
``save_config`` snapshots. Re-designed as a plain recursive dataclass-free
dict subclass; no torch/global state.
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any, Callable, Dict, List, Optional

import yaml


class AttrDict(dict):
    """A dict whose items are also attributes, recursively."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        for key, value in list(self.items()):
            self[key] = self._wrap(value)

    @staticmethod
    def _wrap(value):
        # Always wrap as plain AttrDict — subclasses (Config) have
        # constructor signatures that take filenames, not dicts.
        if isinstance(value, AttrDict):
            return value
        if isinstance(value, dict):
            return AttrDict(value)
        if isinstance(value, (list, tuple)):
            return [AttrDict._wrap(v) for v in value]
        return value

    def __getattr__(self, name: str):
        try:
            return self[name]
        except KeyError as exc:  # pragma: no cover - message clarity
            raise AttributeError(name) from exc

    def __setattr__(self, name: str, value):
        self[name] = self._wrap(value)

    def __setitem__(self, name, value):
        super().__setitem__(name, self._wrap(value))

    def __deepcopy__(self, memo):
        return type(self)({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def setdefault(self, key, default=None):
        if key not in self:
            self[key] = default
        return self[key]

    def to_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for key, value in self.items():
            if isinstance(value, AttrDict):
                out[key] = value.to_dict()
            elif isinstance(value, list):
                out[key] = [v.to_dict() if isinstance(v, AttrDict) else v for v in value]
            else:
                out[key] = value
        return out


def _yaml_loader():
    """A SafeLoader whose float resolver accepts ``5e-4``-style notation.

    Vanilla YAML 1.1 only treats ``5.0e-4`` as a float; configs commonly write
    ``5e-4`` (the reference patches the same resolver, config.py:110-120).
    """
    loader = yaml.SafeLoader
    loader.add_implicit_resolver(
        "tag:yaml.org,2002:float",
        re.compile(
            r"""^(?:
             [-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
            |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
            |\.[0-9_]+(?:[eE][-+][0-9]+)?
            |[-+]?\.(?:inf|Inf|INF)
            |\.(?:nan|NaN|NAN))$""",
            re.X,
        ),
        list("-+0123456789."),
    )
    return loader


def recursive_update(dst: AttrDict, src: dict) -> AttrDict:
    """Merge ``src`` into ``dst`` in place (src wins), recursing into dicts."""
    for key, value in src.items():
        if isinstance(value, dict) and isinstance(dst.get(key), dict):
            recursive_update(dst[key], value)
        else:
            dst[key] = value
    return dst


def recursive_update_strict(dst: AttrDict, src: dict, _stack: Optional[List[str]] = None) -> AttrDict:
    """Like :func:`recursive_update` but unknown keys raise ``KeyError``."""
    _stack = _stack or []
    for key, value in src.items():
        if key not in dst:
            raise KeyError(f"Unknown config key: {'.'.join(_stack + [str(key)])}")
        if isinstance(value, dict) and isinstance(dst.get(key), dict):
            recursive_update_strict(dst[key], value, _stack + [str(key)])
        else:
            dst[key] = value
    return dst


def load_yaml_with_parents(filename: str, _seen: Optional[set] = None) -> AttrDict:
    """Load a YAML file, recursively resolving its ``_parent_`` chain.

    Parent paths resolve relative to the child file's directory first, then
    relative to the current working directory (the reference resolves only
    against cwd; we keep that working and add the more robust option).
    """
    _seen = _seen or set()
    filename = os.path.abspath(filename)
    if filename in _seen:
        raise ValueError(f"Cyclic _parent_ chain at {filename}")
    _seen.add(filename)
    with open(filename) as f:
        cfg = yaml.load(f, Loader=_yaml_loader()) or {}
    cfg = AttrDict(cfg)
    parent = cfg.pop("_parent_", None)
    if parent is not None:
        candidates = [
            os.path.join(os.path.dirname(filename), parent),
            parent,
        ]
        for cand in candidates:
            if os.path.exists(cand):
                parent_path = cand
                break
        else:
            raise FileNotFoundError(f"_parent_ '{parent}' of {filename} not found")
        base = load_yaml_with_parents(parent_path, _seen)
        recursive_update(base, cfg)
        cfg = base
    return cfg


_DEFAULTS_FILE = os.path.join(os.path.dirname(__file__), "config_base.yaml")


class Config(AttrDict):
    """Full experiment configuration.

    Merge order: built-in ``config_base.yaml`` -> user YAML (via its
    ``_parent_`` chain) -> CLI overrides (strict).
    """

    def __init__(self, filename: Optional[str] = None, cli_args: Optional[List[str]] = None):
        super().__init__()
        if os.path.exists(_DEFAULTS_FILE):
            recursive_update(self, load_yaml_with_parents(_DEFAULTS_FILE))
        if filename is not None:
            recursive_update(self, load_yaml_with_parents(filename))
        self["source_filename"] = filename
        if cli_args:
            recursive_update_strict(self, parse_cmdline_arguments(cli_args))

    def save_config(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        with open(os.path.join(logdir, "config.yaml"), "w") as f:
            yaml.safe_dump(self.to_dict(), f, default_flow_style=False, indent=4)

    def print_config(self, level: int = 0):
        # Colored dump like the reference's (imaginaire/config.py:136-143);
        # utils/console no-ops the ANSI codes on non-tty/NO_COLOR outputs.
        from mlinerf_tpu.utils.console import cyan, green

        for key, value in sorted(self.items()):
            if isinstance(value, dict):
                print("   " * level + f"* {green(key)}:")
                Config.print_config(value, level + 1)
            else:
                print("   " * level + f"* {green(key)}: {cyan(value)}")


def parse_cmdline_arguments(args: List[str]) -> Dict[str, Any]:
    """Parse ``--key1.key2=value`` overrides.

    Syntax (same as the reference, config.py:201-223):
      ``--a.b.c=value`` -> parsed with YAML semantics
      ``--a.b.c=``      -> None
      ``--a.b.c``       -> True
      ``--a.b.c!``      -> False
    """
    out: Dict[str, Any] = {}
    for arg in args:
        if not arg.startswith("--"):
            raise ValueError(f"Config overrides must start with '--': {arg}")
        body = arg[2:]
        if "=" not in body:
            key_str, value = (body[:-1], "false") if body.endswith("!") else (body, "true")
        else:
            key_str, value = body.split("=", 1)
        node = out
        keys = key_str.split(".")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        if keys[-1] in node:
            raise ValueError(f"Duplicate override for {key_str}")
        node[keys[-1]] = yaml.safe_load(value) if value != "" else None
    return out


class StaticConfig:
    """Immutable, attribute-access view of a config subtree that is NOT a
    dict subclass — safe to store on flax.linen modules (linen freezes dict
    fields into FrozenDicts, which drop attribute access).
    """

    __slots__ = ("_data",)

    def __init__(self, data):
        object.__setattr__(self, "_data", dict(data) if not isinstance(data, dict) else data)

    @classmethod
    def _wrap(cls, value):
        if isinstance(value, StaticConfig):
            return value
        if isinstance(value, dict):
            return cls(value)
        return value

    def __getattr__(self, name):
        try:
            return self._wrap(self._data[name])
        except KeyError as exc:
            raise AttributeError(name) from exc

    def __getitem__(self, name):
        return self._wrap(self._data[name])

    def __contains__(self, name):
        return name in self._data

    def __iter__(self):
        return iter(self._data)

    def __len__(self):
        return len(self._data)

    def get(self, name, default=None):
        return self._wrap(self._data.get(name, default))

    def keys(self):
        return self._data.keys()

    def items(self):
        return [(k, self._wrap(v)) for k, v in self._data.items()]

    def to_dict(self):
        return self._data if not isinstance(self._data, AttrDict) else self._data.to_dict()

    def __repr__(self):
        return f"StaticConfig({self._data!r})"


# ---------------------------------------------------------------------------
# Registry: string -> class. Replaces the reference's importlib plugin idiom
# (cfg.trainer.type -> module.Trainer etc., get_trainer.py:31-32) with an
# explicit registry; dotted module paths still work as a fallback so configs
# written for the reference layout keep loading.
# ---------------------------------------------------------------------------

_REGISTRIES: Dict[str, Dict[str, Any]] = {"model": {}, "trainer": {}, "dataset": {}}

# Dotted-path aliases so reference-style configs (projects.NeuralLumen.model)
# resolve to the TPU-native implementations.
_ALIASES: Dict[str, Dict[str, str]] = {
    "model": {
        "projects.nerf.models.nerf": "nerf",
        "projects.nerf.models.ingp": "ingp",
        "projects.neuralangelo.model": "neuralangelo",
        "projects.NeuralLumen.model": "lumen",
    },
    "trainer": {
        "projects.nerf.trainers.nerf": "nerf",
        "projects.neuralangelo.trainer": "neuralangelo",
        "projects.NeuralLumen.trainer": "lumen",
    },
    "dataset": {
        "projects.nerf.datasets.nerf_blender": "nerf_blender",
        "projects.nerf.datasets.nerf_llff": "nerf_llff",
        "projects.neuralangelo.data": "neuralangelo",
        "projects.NeuralLumen.data": "lumen",
        "projects.NeuralLumen.data_blender": "lumen_blender",
    },
}


def register(kind: str, name: str) -> Callable:
    """Class decorator: ``@register("model", "nerf")``."""

    def deco(cls):
        _REGISTRIES[kind][name] = cls
        return cls

    return deco


def resolve(kind: str, name: str):
    """Resolve a registry name (or reference-style dotted alias) to a class."""
    # Ensure built-ins registered (import side effects).
    _import_builtin(kind)
    name = _ALIASES.get(kind, {}).get(name, name)
    reg = _REGISTRIES[kind]
    if name in reg:
        return reg[name]
    # Fallback: dotted path "package.module:Class" or "package.module.Class".
    import importlib

    if ":" in name:
        module_name, cls_name = name.split(":")
    else:
        module_name, _, cls_name = name.rpartition(".")
    try:
        module = importlib.import_module(module_name)
        return getattr(module, cls_name)
    except (ImportError, AttributeError, ValueError) as exc:
        raise KeyError(
            f"Unknown {kind} '{name}'. Registered: {sorted(reg)}"
        ) from exc


_IMPORTED = set()


def _import_builtin(kind: str):
    if kind in _IMPORTED:
        return
    _IMPORTED.add(kind)
    import importlib

    modules = {
        "model": ["mlinerf_tpu.models.nerf", "mlinerf_tpu.models.ingp",
                  "mlinerf_tpu.models.neuralangelo", "mlinerf_tpu.models.lumen"],
        "trainer": ["mlinerf_tpu.trainers.nerf", "mlinerf_tpu.trainers.neuralangelo", "mlinerf_tpu.trainers.lumen"],
        "dataset": ["mlinerf_tpu.data.blender", "mlinerf_tpu.data.llff", "mlinerf_tpu.data.lumen",
                    "mlinerf_tpu.data.lumen_blender", "mlinerf_tpu.data.synthetic"],
    }
    for mod in modules.get(kind, []):
        try:
            importlib.import_module(mod)
        except ImportError:
            pass
