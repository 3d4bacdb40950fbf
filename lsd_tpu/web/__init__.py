from .server import PerceptionServer
