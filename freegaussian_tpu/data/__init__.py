from .cameras import Camera
