from .server import ViewerServer, render_orbit_view
