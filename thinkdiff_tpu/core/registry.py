"""Global registry: string name -> class maps for builders/tasks/models/
processors/lr schedulers/runners, plus a dotted-path key/value store.

Same public surface as the reference registry
(reference: thinkdiff/common/registry.py:22-326) so configs and entry points
can resolve components by the same names, but reimplemented minimally.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    mapping: Dict[str, Any] = {
        "builder_name_mapping": {},
        "task_name_mapping": {},
        "model_name_mapping": {},
        "processor_name_mapping": {},
        "lr_scheduler_name_mapping": {},
        "runner_name_mapping": {},
        "paths": {},
        "state": {},
    }

    # -- decorator factories ------------------------------------------------
    @classmethod
    def _register_cls(cls, table: str, name: str) -> Callable:
        def wrap(obj):
            mapping = cls.mapping[table]
            if name in mapping and mapping[name] is not obj:
                raise KeyError(
                    f"Name '{name}' already registered for {mapping[name]} in {table}"
                )
            mapping[name] = obj
            return obj

        return wrap

    @classmethod
    def register_builder(cls, name: str) -> Callable:
        return cls._register_cls("builder_name_mapping", name)

    @classmethod
    def register_task(cls, name: str) -> Callable:
        return cls._register_cls("task_name_mapping", name)

    @classmethod
    def register_model(cls, name: str) -> Callable:
        return cls._register_cls("model_name_mapping", name)

    @classmethod
    def register_processor(cls, name: str) -> Callable:
        return cls._register_cls("processor_name_mapping", name)

    @classmethod
    def register_lr_scheduler(cls, name: str) -> Callable:
        return cls._register_cls("lr_scheduler_name_mapping", name)

    @classmethod
    def register_runner(cls, name: str) -> Callable:
        return cls._register_cls("runner_name_mapping", name)

    # -- path + generic store ----------------------------------------------
    @classmethod
    def register_path(cls, name: str, path: str, allow_overwrite: bool = False):
        if not allow_overwrite and name in cls.mapping["paths"]:
            raise KeyError(f"Path '{name}' already registered")
        cls.mapping["paths"][name] = path

    @classmethod
    def get_path(cls, name: str, default: Any = None) -> Any:
        return cls.mapping["paths"].get(name, default)

    @classmethod
    def register(cls, name: str, obj: Any, allow_overwrite: bool = False):
        """Register a value under a dotted path into the 'state' store."""
        path = name.split(".")
        current = cls.mapping["state"]
        for part in path[:-1]:
            current = current.setdefault(part, {})
        if path[-1] in current and not allow_overwrite:
            raise KeyError(f"State key '{name}' already registered")
        current[path[-1]] = obj

    @classmethod
    def get(cls, name: str, default: Any = None, no_warning: bool = True) -> Any:
        path = name.split(".")
        current = cls.mapping["state"]
        for part in path:
            if not isinstance(current, dict) or part not in current:
                return default
            current = current[part]
        return current

    @classmethod
    def unregister(cls, name: str) -> Any:
        return cls.mapping["state"].pop(name, None)

    # -- lookups ------------------------------------------------------------
    @classmethod
    def get_builder_class(cls, name: str):
        return cls.mapping["builder_name_mapping"].get(name)

    @classmethod
    def get_task_class(cls, name: str):
        return cls.mapping["task_name_mapping"].get(name)

    @classmethod
    def get_model_class(cls, name: str):
        return cls.mapping["model_name_mapping"].get(name)

    @classmethod
    def get_processor_class(cls, name: str):
        return cls.mapping["processor_name_mapping"].get(name)

    @classmethod
    def get_lr_scheduler_class(cls, name: str):
        return cls.mapping["lr_scheduler_name_mapping"].get(name)

    @classmethod
    def get_runner_class(cls, name: str):
        return cls.mapping["runner_name_mapping"].get(name)

    @classmethod
    def list_models(cls):
        return sorted(cls.mapping["model_name_mapping"].keys())

    @classmethod
    def list_tasks(cls):
        return sorted(cls.mapping["task_name_mapping"].keys())

    @classmethod
    def list_builders(cls):
        return sorted(cls.mapping["builder_name_mapping"].keys())

    @classmethod
    def list_processors(cls):
        return sorted(cls.mapping["processor_name_mapping"].keys())


registry = Registry()
