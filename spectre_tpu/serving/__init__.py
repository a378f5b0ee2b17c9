from spectre_tpu.serving.client import SpectreClient, start_server

__all__ = ["SpectreClient", "start_server"]
