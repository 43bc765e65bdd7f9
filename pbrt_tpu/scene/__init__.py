"""Scene compilation: SceneDescription -> flat device tables."""
