"""Serving layer: MCP stdio JSON-RPC server and HTTP server."""
