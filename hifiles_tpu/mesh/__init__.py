from .core import MeshData, FaceConnectivity, build_faces
from .generate import periodic_quad_mesh, periodic_hex_mesh

__all__ = ["MeshData", "FaceConnectivity", "build_faces",
           "periodic_quad_mesh", "periodic_hex_mesh"]
