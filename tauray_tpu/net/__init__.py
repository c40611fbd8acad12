"""Out-of-process services (reference: SURVEY.md §5.8):

* DSHGI probe streaming over ZeroMQ XPUB/SUB
  (reference: src/dshgi_server.cc, src/dshgi_client.cc)
* frame/input streaming for remote viewers
  (reference: src/frame_server.cc, src/frame_client.cc — NNG bus0; here a
  plain TCP socket protocol since NNG isn't available)
"""
