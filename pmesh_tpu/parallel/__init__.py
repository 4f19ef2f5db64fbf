from .domain import Layout, GridND, FakeComm  # noqa: F401
