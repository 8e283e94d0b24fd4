from .catalog import make, make_functional, registry, ENV_IDS

__all__ = ["make", "make_functional", "registry", "ENV_IDS"]
