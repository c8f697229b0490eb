"""Serving layer: REST API + dashboard + metrics exporter (SURVEY.md L6/L7).

Flask/SocketIO are not available in this environment, so the HTTP surface
is built on a small stdlib-WSGI micro-framework (``iqc_tpu/serving/wsgi.py``)
that reproduces the reference's route map (``app.py`` + ``api/routes.py``)
with the same JSON schemas. Real-time push (the reference's Socket.IO
events, ``app.py:238-261``) is served as Server-Sent Events at /events.
"""
