import matplotlib

matplotlib.use("Agg")  # headless everywhere
