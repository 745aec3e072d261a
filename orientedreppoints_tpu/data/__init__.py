from . import dota, loader, pipelines
