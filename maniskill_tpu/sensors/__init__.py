from .camera import Camera, CameraConfig
