"""Network transports over the in-process controllers.

``transport.http`` binds the core and serving REST facades to real
localhost sockets (stdlib ``http.server``); ``transport.grpc_adapter``
is the import-guarded gRPC servicer seam (grpcio optional).
"""

from .http import (  # noqa: F401
    CoreRestHttpServer,
    RestHttpServer,
    ServingRestHttpServer,
)
