from .body import QuadPilotBody  # noqa: F401
from .camera import QuadPilotCamera  # noqa: F401
