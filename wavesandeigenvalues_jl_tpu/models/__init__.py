from .helmholtz import discretize
from .network import discretize_network

__all__ = ["discretize", "discretize_network"]
