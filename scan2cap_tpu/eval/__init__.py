"""Evaluation: device-side NMS/box decode, host-side caption metrics + AP."""
