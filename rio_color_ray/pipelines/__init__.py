"""End-to-end Ray Data pipelines (lazy Dataset builders).

Every function takes ``sf_dir`` and returns a (lazy) ``ray.data.Dataset``;
nothing here calls ``ray.init`` — the caller owns the session.
"""
