"""REST infrastructure (cppREST analogue) and the GSvar server application.

Behavioral reference: ngs-bits src/cppREST (SslServer, EndpointManager,
SessionManager, UrlManager, HttpResponse) and src/GSvarServer (endpoint set
registered in GSvarServer/main.cpp:38-90, SGE/Slurm queueing controllers).
"""

from .sessions import Session, SessionManager, UrlEntity, UrlManager
from .endpoints import Endpoint, EndpointManager, ParamProps
from .server import GSvarServer
