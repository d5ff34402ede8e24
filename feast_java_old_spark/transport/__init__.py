"""Network transports over the in-process controllers.

``transport.http`` binds the core and serving REST facades to real
localhost sockets (stdlib ``http.server``); ``transport.grpc_adapter``
is the import-guarded gRPC servicer seam (grpcio optional);
``transport.grpc_http`` binds those servicers to a real socket TODAY
(JSON codec at ``build_server``'s method paths — what the client SDK
speaks); ``transport.transform_service`` is the external ODFV
transformation service (Arrow IPC payloads over a real socket) and its
serving-side client.
"""

from .grpc_http import GrpcHttpServer  # noqa: F401
from .http import (  # noqa: F401
    CoreRestHttpServer,
    RestHttpServer,
    ServingRestHttpServer,
)
from .transform_service import (  # noqa: F401
    HttpTransformationService,
    TransformServer,
)
