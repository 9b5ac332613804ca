from coastline.infer.extract import CoastlineExtractor  # noqa: F401
