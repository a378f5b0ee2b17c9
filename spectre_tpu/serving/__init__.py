from spectre_tpu.serving.client import SpectreClient, start_server

__all__ = ["SpectreClient", "start_server", "JaxServer"]


def __getattr__(name):
    # lazy: importing the client must not pull in jax (lightweight callers)
    if name == "JaxServer":
        from spectre_tpu.serving.jax_server import JaxServer

        return JaxServer
    raise AttributeError(name)
