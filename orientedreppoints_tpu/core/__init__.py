from . import points, rbox
