from .helmholtz import discretize

__all__ = ["discretize"]
