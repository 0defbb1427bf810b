from .client import TelemetryClient  # noqa: F401
from .scope import ForceScope, watch  # noqa: F401
from .server import TelemetryServer, simulation_packet  # noqa: F401
