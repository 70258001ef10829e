from .server import BridgeServer, serve
