"""Task env registry (reference fluidlab/envs/__init__.py:4-10).

The reference registers 12 env ids but ships 10 implementations
(Scooping/Stabilizing are registered yet absent — SURVEY.md §2.10); we
implement the 10 real ones.  Use :func:`make` or gymnasium.make.
"""

from fluidlab_tpu.envs.fluid_env import FluidEnv  # noqa: F401

_REGISTRY = {}


def register(name):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


def make(env_name, **kwargs):
    """Create a task env by id, e.g. ``make('LatteArt-v0', seed=0)``."""
    if env_name not in _REGISTRY:
        # import task modules lazily to populate the registry
        from fluidlab_tpu.envs import tasks  # noqa: F401
    if env_name not in _REGISTRY:
        raise KeyError(
            f"unknown env {env_name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[env_name](**kwargs)


def available_envs():
    from fluidlab_tpu.envs import tasks  # noqa: F401

    return sorted(_REGISTRY)
