from coastline.models.registry import MODEL_REGISTRY, create_model  # noqa: F401
