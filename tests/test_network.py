"""Board network validation + nmcli plan (ref util/setup_network.py)."""
from lsd_tpu.utils.network import (apply_network, is_valid_ipv4_address,
                                   is_valid_ipv4_mask, network_validation,
                                   nmcli_plan, prefix_len)


def test_address_and_mask_validation():
    assert is_valid_ipv4_address("192.168.1.10")
    assert not is_valid_ipv4_address("256.1.1.1")
    assert not is_valid_ipv4_address("1.2.3")
    assert not is_valid_ipv4_address(None)
    assert is_valid_ipv4_mask("255.255.255.0")
    assert is_valid_ipv4_mask("255.255.254.0")
    assert is_valid_ipv4_mask("0.0.0.0")
    assert not is_valid_ipv4_mask("255.0.255.0")     # non-contiguous
    assert prefix_len("255.255.255.0") == 24


def test_network_validation_messages():
    cfg = dict(board=dict(network=[dict(IP="10.0.0.5", mask="255.255.255.0",
                                        gateway="10.0.0.1")]),
               output=dict(protocol=dict(UDP=dict(use=True, dest="127.0.0.1",
                                                  port=19000))))
    assert network_validation(cfg) == (True, "")
    bad_ip = dict(cfg, board=dict(network=[dict(IP="1.2.3", mask="255.0.0.0",
                                                gateway="1.2.3.4")]))
    assert network_validation(bad_ip)[1] == "Invalid Board Network IP address"
    bad_port = dict(cfg, output=dict(protocol=dict(
        UDP=dict(use=True, dest="127.0.0.1", port=80))))
    assert network_validation(bad_port)[1] == "Invalid UDP destination port"
    # DHCP interfaces skip address checks
    dhcp = dict(board=dict(network=[dict(DHCP=True)]))
    assert network_validation(dhcp)[0]


def test_nmcli_plan_static_and_dhcp():
    nets = [dict(IP="10.0.0.5", mask="255.255.255.0", gateway="10.0.0.1"),
            dict(DHCP=True)]
    cmds = nmcli_plan(nets)
    assert any("ipv4.addresses 10.0.0.5/24" in c for c in cmds)
    assert any("eth1 ipv4.method auto" in c for c in cmds)
    # iface filter
    only1 = nmcli_plan(nets, ifaces=["1"])
    assert not any("eth0 ipv4" in c for c in only1)
    ran = []
    assert apply_network(nets, run=ran.append) == len(cmds)
    assert ran == cmds


def test_perception_rejects_invalid_network():
    from lsd_tpu.runtime import clear_interfaces
    from lsd_tpu.runtime.perception import Perception
    clear_interfaces()
    p = Perception()
    cfg = p.get_config()
    cfg["board"]["network"] = [dict(IP="999.1.1.1", mask="255.0.0.0",
                                    gateway="1.1.1.1")]
    assert p.set_config(cfg) == "Invalid Board Network IP address"
    # config unchanged
    assert p.get_config()["board"]["network"] == []
    clear_interfaces()
