"""Scene & asset layer — the TPU equivalent of RenderCore/render storage classes +
model_import/ (SURVEY.md §2.2): pooled mega-buffers, material/texture registries, the
primitive table, and glTF import."""

from androidrenderer_tpu.scene.mesh_storage import MeshStorage
from androidrenderer_tpu.scene.material_storage import MaterialStorage
from androidrenderer_tpu.scene.scene import RenderScene, SceneArrays

__all__ = ["MeshStorage", "MaterialStorage", "RenderScene", "SceneArrays"]
