"""String-keyed component registry.

TPU-native re-imagining of the reference's registry/config spine
(ref: mmdet/utils/registry.py (Registry, build_from_cfg)): every model
component (backbone, neck, head, loss, detector, dataset, transform) is a
class or callable registered under a string name, and configs are nested
dicts with a ``type`` key resolved at build time.  We keep that pattern —
it is what makes the config zoo portable — but the registry itself is a
tiny dict wrapper with no metaclass magic.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional


class Registry:
    """Maps string names to classes/callables."""

    def __init__(self, name: str):
        self._name = name
        self._module_dict: Dict[str, Any] = {}

    @property
    def name(self) -> str:
        return self._name

    @property
    def module_dict(self) -> Dict[str, Any]:
        return self._module_dict

    def get(self, key: str) -> Optional[Any]:
        return self._module_dict.get(key)

    def __contains__(self, key: str) -> bool:
        return key in self._module_dict

    def __repr__(self) -> str:
        return f"Registry(name={self._name}, items={list(self._module_dict)})"

    def register_module(self, cls: Optional[Any] = None, *, name: Optional[str] = None,
                        force: bool = False) -> Callable:
        """Register a class/callable. Usable as ``@R.register_module`` or
        ``@R.register_module(name="Alias")``."""

        def _register(obj):
            key = name or obj.__name__
            if not force and key in self._module_dict:
                raise KeyError(f"{key} is already registered in {self._name}")
            self._module_dict[key] = obj
            return obj

        if cls is None:
            return _register
        return _register(cls)


def build_from_cfg(cfg: dict, registry: Registry, default_args: Optional[dict] = None):
    """Instantiate ``registry[cfg['type']](**cfg_without_type, **default_args)``.

    Mirrors the reference semantics (ref: mmdet/utils/registry.py
    (build_from_cfg)): ``type`` may be a string (looked up) or a class
    (used directly); ``default_args`` fill in missing keys only.
    """
    if not isinstance(cfg, dict) or "type" not in cfg:
        raise TypeError(f"cfg must be a dict with a 'type' key, got {cfg!r}")
    args = dict(cfg)
    obj_type = args.pop("type")
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(f"{obj_type} is not registered in {registry.name}")
    elif inspect.isclass(obj_type) or callable(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f"type must be a str or class, got {type(obj_type)}")
    if default_args is not None:
        for k, v in default_args.items():
            args.setdefault(k, v)
    return obj_cls(**args)
