from .app import ViewerApp
from .camera import OrbitCamera
from .controllers import (FrameTimer, ResolutionController,
                          TrainStepController)
from .server import serve

__all__ = ["ViewerApp", "OrbitCamera", "FrameTimer",
           "ResolutionController", "TrainStepController", "serve"]
